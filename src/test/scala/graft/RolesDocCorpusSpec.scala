package graft

/** The reference's own admin doctest sequences replayed end to end
  * (docs/admin/privileges.rst, docs/admin/user-management.rst — the
  * blackbox doctest corpus is the reference's acceptance suite, SURVEY
  * §5.4). The only adaptation: the built-in superuser is the process
  * user, not literally `crate`, so grantor cells compare against it. */
class RolesDocCorpusSpec extends SparkTestBase {

  test("privileges.rst: grant/deny graph and the sys.privileges table") {
    graft.sources.Roles.reset()
    try {
      val root = graft.ArtifactStore.scratchDir("graft_docp").toFile.getAbsolutePath
      val r = new StatementRouter(spark, root)
      // privileges.rst:111-159, 214-240 — the statements as written
      Seq(
        "CREATE USER riley",
        "CREATE USER kala",
        """CREATE TABLE IF NOT EXISTS doc.accounting (
             id integer primary key, name text, joined timestamp)""",
        "INSERT INTO doc.accounting (id, name) VALUES (1, 'Jon')",
        "REFRESH TABLE doc.accounting",
        "GRANT DQL ON SCHEMA doc TO riley",
        "DENY DQL ON TABLE doc.accounting TO riley",
        "CREATE USER wolfgang",
        "CREATE USER will",
        "CREATE TABLE IF NOT EXISTS doc.books (title text)",
        "GRANT DML TO wolfgang",
        "GRANT DDL ON TABLE doc.books TO will"
      ).foreach(r.execute)
      graft.sources.SysCatalog.registerAll(spark, sfDir)
      // privileges.rst:345 — the catalog table, row for row
      val got = spark.sql(
        "SELECT class, grantee, grantor, ident, state, type FROM sys_privileges " +
        "ORDER BY grantee, class, ident").collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2),
          x.getString(3), x.getString(4), x.getString(5)))
      val me = spark.sparkContext.sparkUser
      assert(got.toSeq == Seq(
        ("SCHEMA", "riley", me, "doc", "GRANT", "DQL"),
        ("TABLE", "riley", me, "doc.accounting", "DENY", "DQL"),
        ("TABLE", "will", me, "doc.books", "GRANT", "DDL"),
        ("CLUSTER", "wolfgang", me, null, "GRANT", "DML")))
      // privileges.rst:152-187 — riley reads the schema but not the
      // denied table; a view over it is its own securable
      r.execute("SET SESSION AUTHORIZATION riley")
      assert(intercept[Exception](r.execute("SELECT * FROM doc.accounting"))
        .getMessage.contains("Missing 'DQL'"))
      r.execute("RESET SESSION AUTHORIZATION")
      // privileges.rst:307-319 — REVOKE drops entries, grants or denies
      r.execute("REVOKE DQL ON TABLE doc.accounting FROM riley")
      r.execute("REVOKE ALL FROM wolfgang")
      graft.sources.SysCatalog.registerAll(spark, sfDir)
      assert(spark.sql("SELECT count(*) FROM sys_privileges").head().getLong(0) == 2L)
    } finally graft.sources.Roles.reset()
  }

  test("user-management.rst: role lifecycle, inheritance listing, error shapes") {
    graft.sources.Roles.reset()
    try {
      val root = graft.ArtifactStore.scratchDir("graft_docu").toFile.getAbsolutePath
      val r = new StatementRouter(spark, root)
      // :52-87 — quoted role names, duplicate error
      r.execute("CREATE ROLE role_a")
      r.execute("""CREATE ROLE "Custom Role"""")
      assert(intercept[Exception](r.execute("""CREATE ROLE "Custom Role""""))
        .getMessage.contains("already exists"))
      r.execute("""DROP ROLE "Custom Role"""")
      // :103-125 — DROP USER works on a role; unknown role error text
      r.execute("CREATE ROLE role_c")
      r.execute("CREATE ROLE role_d")
      r.execute("DROP ROLE role_c")
      r.execute("DROP USER role_d")
      assert(intercept[Exception](r.execute("DROP ROLE role_d"))
        .getMessage.contains("Role 'role_d' does not exist"))
      // :134-147 — sys.roles granted_roles objects
      r.execute("CREATE ROLE role_b")
      r.execute("CREATE ROLE role_c")
      r.execute("GRANT role_c TO role_b")
      graft.sources.SysCatalog.registerAll(spark, sfDir)
      val roles = spark.sql(
        "SELECT name, granted_roles FROM sys_roles ORDER BY name").collect()
      assert(roles.map(_.getString(0)).toSeq == Seq("role_a", "role_b", "role_c"))
      val rb = roles(1).getSeq[org.apache.spark.sql.Row](1)
      assert(rb.length == 1 && rb.head.getString(0) == "role_c" &&
        rb.head.getString(1) == spark.sparkContext.sparkUser)
      // :190 — password user; sys.users masks it
      r.execute("CREATE USER user_b WITH (password = 'a_secret_password')")
      graft.sources.SysCatalog.registerAll(spark, sfDir)
      assert(spark.sql("SELECT password FROM sys_users WHERE name = 'user_b'")
        .head().getString(0) == "********")
    } finally graft.sources.Roles.reset()
  }
}
