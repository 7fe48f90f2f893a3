package graft

/** Users, roles and privileges through the router (reference
  * `io.crate.role` + docs/sql/statements/{create-user,grant,deny,revoke}
  * .rst), and DECLARE/FETCH/CLOSE cursors as routed SQL
  * (docs/sql/statements/{declare,fetch,close}.rst).
  */
class RolesSpec extends SparkTestBase {

  private def newRouter() = {
    val root = graft.ArtifactStore.scratchDir("graft_roles").toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  private def freshRoles(): Unit = {
    graft.sources.Roles.reset()
    spark.conf.unset("graft.session.user")
  }

  test("CREATE USER / ROLE in all password spellings; DROP dependency rule") {
    freshRoles()
    val r = newRouter()
    r.execute("CREATE USER john WITH (password = 'secret')")
    r.execute("CREATE USER jane WITH password = 'pw2'")
    r.execute("CREATE USER jim WITH password 'pw3'")
    r.execute("CREATE USER joe password 'pw4'")
    r.execute("CREATE ROLE analysts")
    // ROLE cannot carry a password (create-role.rst NOTE)
    val e = intercept[Exception](r.execute("CREATE ROLE r2 WITH (password = 'x')"))
    assert(e.getMessage.contains("password"))
    // duplicate
    assert(intercept[Exception](r.execute("CREATE USER john"))
      .getMessage.contains("already exists"))
    // grant role, then the role cannot be dropped while granted
    r.execute("GRANT analysts TO john")
    assert(intercept[Exception](r.execute("DROP ROLE analysts"))
      .getMessage.contains("granted"))
    r.execute("REVOKE analysts FROM john")
    r.execute("DROP ROLE analysts")
    r.execute("DROP USER IF EXISTS nobody") // no error
    assert(intercept[Exception](r.execute("DROP USER nobody"))
      .getMessage.contains("does not exist"))
    r.execute("ALTER USER john SET (password = 'better')")
    freshRoles()
  }

  test("privilege resolution: securable ladder, DENY dominance, inheritance") {
    freshRoles()
    val R = graft.sources.Roles
    val r = newRouter()
    r.execute("CREATE USER bob WITH (password = 'x')")
    r.execute("CREATE ROLE readers")
    r.execute("CREATE ROLE writers")
    // cluster-level DQL through a role
    r.execute("GRANT DQL TO readers")
    r.execute("GRANT readers TO bob")
    assert(R.hasPrivilege("bob", "DQL", "TABLE", Some("doc.orders")))
    assert(!R.hasPrivilege("bob", "DML", "TABLE", Some("doc.orders")))
    // DENY at table level beats the inherited cluster GRANT
    r.execute("DENY DQL ON TABLE orders TO bob")
    assert(!R.hasPrivilege("bob", "DQL", "TABLE", Some("doc.orders")))
    assert(R.hasPrivilege("bob", "DQL", "TABLE", Some("doc.lineitem")))
    // REVOKE the deny → grant shines through again
    r.execute("REVOKE DQL ON TABLE orders FROM bob")
    assert(R.hasPrivilege("bob", "DQL", "TABLE", Some("doc.orders")))
    // schema-level grant reaches tables beneath it
    r.execute("GRANT DML ON SCHEMA doc TO writers")
    r.execute("GRANT writers TO bob")
    assert(R.hasPrivilege("bob", "DML", "TABLE", Some("doc.orders")))
    assert(!R.hasPrivilege("bob", "DML", "SCHEMA", Some("other")))
    // parent-DENY dominates a sibling parent's GRANT (Roles.java:197)
    r.execute("CREATE ROLE banned")
    r.execute("DENY DML ON SCHEMA doc TO banned")
    r.execute("GRANT banned TO bob")
    assert(!R.hasPrivilege("bob", "DML", "TABLE", Some("doc.orders")))
    // ALL expands to the four permissions
    r.execute("CREATE USER admin2 WITH (password = 'a')")
    r.execute("GRANT ALL PRIVILEGES TO admin2")
    assert(R.Permissions.forall(p => R.hasPrivilege("admin2", p, "CLUSTER", None)))
    // cycles rejected
    r.execute("CREATE ROLE r1")
    r.execute("CREATE ROLE r2")
    r.execute("GRANT r1 TO r2")
    assert(intercept[Exception](r.execute("GRANT r2 TO r1"))
      .getMessage.contains("cyclic"))
    freshRoles()
  }

  test("sys.users / sys.roles / sys.privileges and SET SESSION AUTHORIZATION") {
    freshRoles()
    val r = newRouter()
    r.execute("CREATE USER alice WITH (password = 's3')")
    r.execute("CREATE ROLE auditors")
    r.execute("GRANT auditors TO alice")
    r.execute("GRANT DQL ON TABLE doc.events TO auditors")
    graft.sources.SysCatalog.registerAll(spark, sfDir)
    val process = spark.sparkContext.sparkUser
    val users = spark.sql(
      "SELECT name, superuser, password, granted_roles FROM sys_users ORDER BY name")
      .collect()
    assert(users.map(_.getString(0)).toSet == Set("alice", process))
    val alice = users.find(_.getString(0) == "alice").get
    assert(alice.getString(2) == "********" && !alice.getBoolean(1))
    // granted_roles is the reference's array of {role, grantor} objects
    assert(alice.getSeq[org.apache.spark.sql.Row](3).map(_.getString(0)) == Seq("auditors"))
    assert(users.find(_.getString(0) == process).get.getBoolean(1))
    assert(spark.sql("SELECT name FROM sys_roles").collect()
      .map(_.getString(0)).toSeq == Seq("auditors"))
    val priv = spark.sql(
      "SELECT grantee, state, type, class, ident FROM sys_privileges").collect()
    assert(priv.length == 1)
    assert(priv(0).getString(0) == "auditors" && priv(0).getString(1) == "GRANT" &&
      priv(0).getString(2) == "DQL" && priv(0).getString(3) == "TABLE" &&
      priv(0).getString(4) == "doc.events")

    // session authorization flips the effective user for checks + functions
    r.execute("SET SESSION AUTHORIZATION alice")
    assert(r.execute("SELECT current_user AS u").head().getString(0) == "alice")
    assert(r.execute("SELECT has_table_privilege('doc.events', 'SELECT') AS p")
      .head().getBoolean(0))
    assert(!r.execute("SELECT has_table_privilege('doc.orders', 'SELECT') AS p")
      .head().getBoolean(0))
    assert(!r.execute("SELECT has_table_privilege('doc.events', 'INSERT') AS p")
      .head().getBoolean(0))
    // explicit-user arity ignores the session user
    assert(r.execute(
      s"SELECT has_table_privilege('$process', 'doc.orders', 'SELECT') AS p")
      .head().getBoolean(0))
    // unknown target user rejected
    assert(intercept[Exception](r.execute("SET SESSION AUTHORIZATION ghost"))
      .getMessage.contains("does not exist"))
    r.execute("RESET SESSION AUTHORIZATION")
    assert(r.execute("SELECT has_table_privilege('doc.orders', 'DELETE') AS p")
      .head().getBoolean(0)) // process user is the implicit superuser
    freshRoles()
  }

  test("has_schema_privilege / has_database_privilege mappings") {
    freshRoles()
    val r = newRouter()
    r.execute("CREATE USER carol WITH (password = 'c')")
    r.execute("GRANT DDL ON SCHEMA doc TO carol")
    r.execute("SET SESSION AUTHORIZATION carol")
    assert(r.execute("SELECT has_schema_privilege('doc', 'CREATE') AS p")
      .head().getBoolean(0))
    assert(!r.execute("SELECT has_schema_privilege('doc', 'USAGE') AS p")
      .head().getBoolean(0))
    // information_schema usage is public (HasSchemaPrivilegeFunction:60)
    assert(r.execute("SELECT has_schema_privilege('information_schema', 'USAGE') AS p")
      .head().getBoolean(0))
    // CONNECT always true; TEMP never; CREATE via the schema DDL grant
    assert(r.execute("SELECT has_database_privilege('crate', 'CONNECT') AS p")
      .head().getBoolean(0))
    assert(!r.execute("SELECT has_database_privilege('crate', 'TEMP') AS p")
      .head().getBoolean(0))
    assert(r.execute("SELECT has_database_privilege('crate', 'CREATE') AS p")
      .head().getBoolean(0))
    r.execute("RESET SESSION AUTHORIZATION")
    freshRoles()
  }

  test("statement-level enforcement under SET SESSION AUTHORIZATION") {
    freshRoles()
    try {
    val r = newRouter()
    graft.sources.InformationSchema.register(spark)
    r.execute("CREATE TABLE secrets (id BIGINT, v TEXT)")
    r.execute("INSERT INTO secrets (id, v) VALUES (1, 'x')")
    r.execute("CREATE TABLE open_t (id BIGINT)")
    r.execute("INSERT INTO open_t (id) VALUES (7)")
    r.execute("CREATE USER dave WITH (password = 'd')")
    r.execute("GRANT DQL ON TABLE doc.open_t TO dave")
    r.execute("SET SESSION AUTHORIZATION dave")
    // granted read works; ungranted read and any write are denied with
    // the reference's MissingPrivilegeException message shape
    assert(r.execute("SELECT id FROM open_t").head().getLong(0) == 7L)
    assert(intercept[Exception](r.execute("SELECT * FROM secrets"))
      .getMessage == "Missing 'DQL' privilege for user 'dave'")
    assert(intercept[Exception](
      r.execute("INSERT INTO open_t (id) VALUES (8)"))
      .getMessage == "Missing 'DML' privilege for user 'dave'")
    assert(intercept[Exception](r.execute("DROP TABLE secrets"))
      .getMessage == "Missing 'DDL' privilege for user 'dave'")
    assert(intercept[Exception](r.execute("CREATE USER eve"))
      .getMessage == "Missing 'AL' privilege for user 'dave'")
    // relation-less SELECT is free; information_schema is public
    assert(r.execute("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    r.execute("SELECT table_name FROM information_schema.tables").collect()
    // sys.* needs a cluster grant
    assert(intercept[Exception](r.execute("SELECT name FROM sys.cluster"))
      .getMessage.contains("Missing 'DQL'"))
    // a rejected qualified CREATE TABLE must not leave its implicitly
    // created schema behind (catalog mutation only after authorization)
    assert(intercept[Exception](
      r.execute("CREATE TABLE sneaky.t (id BIGINT)"))
      .getMessage == "Missing 'DDL' privilege for user 'dave'")
    assert(!r.execute(
      "SELECT schema_name FROM information_schema.schemata")
      .collect().map(_.getString(0)).contains("sneaky"))
    r.execute("RESET SESSION AUTHORIZATION")
    assert(!r.execute(
      "SELECT schema_name FROM information_schema.schemata")
      .collect().map(_.getString(0)).contains("sneaky"))
    // back to the process superuser: everything works again
    r.execute("SELECT * FROM secrets").collect()
    r.execute("DROP TABLE secrets")
    } finally freshRoles()
  }

  test("enforcement resolves schema-qualified and search_path targets") {
    freshRoles()
    try {
      val r = newRouter()
      r.execute("CREATE TABLE s5.t (id BIGINT)")
      r.execute("INSERT INTO s5.t (id) VALUES (11)")
      r.execute("CREATE USER frank WITH (password = 'f')")
      // DDL granted on the qualified table authorizes DDL on exactly it —
      // the pre-fix resolver checked TABLE 'doc.s5' instead
      r.execute("GRANT DDL ON TABLE s5.t TO frank")
      r.execute("GRANT DQL ON TABLE s5.t TO frank")
      // a doc-schema grant must NOT leak into schema s5
      r.execute("CREATE USER docwriter WITH (password = 'd')")
      r.execute("GRANT DDL ON SCHEMA doc TO docwriter")
      r.execute("SET SESSION AUTHORIZATION docwriter")
      assert(intercept[Exception](r.execute("DROP TABLE s5.t"))
        .getMessage == "Missing 'DDL' privilege for user 'docwriter'")
      // search_path: a bare name is checked as the relation it resolves
      // to, so frank's grant on s5.t authorizes `SELECT … FROM t`
      r.execute("SET SESSION AUTHORIZATION frank")
      r.execute("SET search_path TO s5")
      assert(r.execute("SELECT id FROM t").head().getLong(0) == 11L)
      // …while docwriter (no DQL anywhere) stays denied on the same text
      r.execute("SET SESSION AUTHORIZATION docwriter")
      assert(intercept[Exception](r.execute("SELECT id FROM t"))
        .getMessage == "Missing 'DQL' privilege for user 'docwriter'")
      r.execute("RESET SESSION AUTHORIZATION")
      r.execute("RESET search_path")
      // frank's qualified DDL grant lets him drop the table
      r.execute("SET SESSION AUTHORIZATION frank")
      r.execute("DROP TABLE s5.t")
      r.execute("RESET SESSION AUTHORIZATION")
      // combined has_database_privilege lists are order-INSENSITIVE
      // like the reference (HasDatabasePrivilegeFunction:81-107 checks
      // membership in a fixed TEMP-then-CREATE sequence): both orderings
      // resolve to hasCreate, and any listed CONNECT wins outright
      r.execute("GRANT DDL ON SCHEMA doc TO frank")
      graft.functions.GraftFunctions.registerAll(spark)
      def hdp(perms: String): Boolean =
        r.execute(s"SELECT has_database_privilege('frank', 'crate', '$perms') AS p")
          .head().getBoolean(0)
      assert(hdp("temp,create"))
      assert(hdp("create,temp"))
      assert(!hdp("temp"))
      assert(hdp("temp,connect"))
    } finally {
      try spark.conf.unset("search_path") catch { case _: Exception => () }
      freshRoles()
    }
  }

  test("cursors: DECLARE/FETCH directions/CLOSE as routed SQL") {
    val r = newRouter()
    r.execute("CREATE TABLE seqt (i INTEGER)")
    r.execute("INSERT INTO seqt (i) VALUES (1), (2), (3), (4), (5), (6), (7), (8)")
    r.execute("DECLARE c1 CURSOR FOR SELECT i FROM seqt ORDER BY i")
    assert(r.execute("FETCH NEXT FROM c1").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(r.execute("FETCH 3 FROM c1").collect().map(_.getInt(0)).toSeq == Seq(2, 3, 4))
    assert(r.execute("FETCH FORWARD 2 FROM c1").collect().map(_.getInt(0)).toSeq == Seq(5, 6))
    // NO SCROLL (default) refuses to move backward
    assert(intercept[Exception](r.execute("FETCH ABSOLUTE 2 FROM c1"))
      .getMessage.contains("SCROLL"))
    assert(r.execute("FETCH ALL FROM c1").collect().map(_.getInt(0)).toSeq == Seq(7, 8))
    assert(r.execute("FETCH NEXT FROM c1").collect().isEmpty) // drained
    // open cursors appear in pg_cursors until closed
    assert(graft.sources.Cursor.openCursors.contains("c1"))
    r.execute("CLOSE c1")
    assert(!graft.sources.Cursor.openCursors.contains("c1"))
    assert(intercept[Exception](r.execute("FETCH NEXT FROM c1"))
      .getMessage.contains("No cursor"))

    // SCROLL allows ABSOLUTE/RELATIVE backward movement
    r.execute("DECLARE c2 SCROLL CURSOR FOR SELECT i FROM seqt ORDER BY i")
    assert(r.execute("FETCH ABSOLUTE 5 FROM c2").head().getInt(0) == 5)
    assert(r.execute("FETCH ABSOLUTE 2 FROM c2").head().getInt(0) == 2)
    assert(r.execute("FETCH RELATIVE 3 FROM c2").head().getInt(0) == 5)
    assert(r.execute("FETCH RELATIVE -2 FROM c2").head().getInt(0) == 3)
    assert(r.execute("FETCH RELATIVE 0 FROM c2").head().getInt(0) == 3) // re-read
    assert(r.execute("FETCH ABSOLUTE 100 FROM c2").collect().isEmpty) // past end
    // MOVE repositions and reports the skip count
    r.execute("DECLARE c3 CURSOR FOR SELECT i FROM seqt ORDER BY i")
    assert(r.execute("MOVE FORWARD 3 FROM c3").head().getLong(0) == 3L)
    assert(r.execute("FETCH NEXT FROM c3").head().getInt(0) == 4)
    r.execute("CLOSE ALL")
    assert(graft.sources.Cursor.openCursors.isEmpty)
  }
}
