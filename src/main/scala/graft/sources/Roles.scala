package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Users, roles and privileges — the reference's `io.crate.role` package
  * re-expressed as driver-held catalog state.
  *
  * Semantics ported from public reference sources:
  *  - permissions DQL/DML/DDL/AL (`role/Permission.java:27`), securables
  *    CLUSTER/SCHEMA/TABLE/VIEW (`role/Securable.java:27`), policies
  *    GRANT/DENY/REVOKE (`role/Policy.java:27`).
  *  - USER vs ROLE: a user can log in and carry a password but cannot be
  *    granted to others; a role is the reverse
  *    (`docs/sql/statements/create-user.rst`).
  *  - resolution: exact subject match first, then the securable ladder
  *    TABLE/VIEW → SCHEMA → CLUSTER (`role/RolePrivileges.java:121`);
  *    across the inheritance graph depth-first with DENY dominating any
  *    parent GRANT (`role/Roles.java:172-207`); superusers short-circuit
  *    to GRANT.
  *  - DROP ROLE fails while the role is still granted to others
  *    (`docs/sql/statements/drop-role.rst:40`).
  *
  * Scale note: this is metadata, never data — a few KB of driver state.
  * Expressions that consult it (has_*_privilege) snapshot the graph into
  * an immutable value at plan time, so nothing here ships to executors
  * except that closure.
  */
object Roles {

  final case class GrantedRole(role: String, grantor: String)

  /** One privilege entry, keyed by (grantee, permission, securable, ident).
    * `state` is GRANT or DENY; REVOKE deletes the entry
    * (`role/PrivilegesModifier.java`). */
  final case class Privilege(grantee: String, grantor: String, state: String,
                             permission: String, securable: String,
                             ident: Option[String])

  final case class Role(name: String, isUser: Boolean, superuser: Boolean,
                        password: Option[String],
                        granted: Vector[GrantedRole])

  val Permissions = Seq("DQL", "DML", "DDL", "AL")
  val Securables  = Seq("CLUSTER", "SCHEMA", "TABLE", "VIEW")

  private val roles =
    new java.util.concurrent.ConcurrentHashMap[String, Role]()
  // subject-keyed, like the reference's privilegeByIdent map
  private val privileges =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Option[String]), Privilege]()

  /** Drop every registered role and privilege (test hygiene). The process
    * user needs no registry entry — it is the implicit superuser, playing
    * the part of the reference's built-in `crate` account
    * (`role/Role.java` CRATE_USER). */
  def reset(): Unit = {
    roles.clear(); privileges.clear()
  }

  def find(name: String): Option[Role] = Option(roles.get(name))

  def all: Seq[Role] = {
    import scala.jdk.CollectionConverters._
    roles.values.asScala.toSeq.sortBy(_.name)
  }

  def allPrivileges: Seq[Privilege] = {
    import scala.jdk.CollectionConverters._
    privileges.values.asScala.toSeq
      .sortBy(p => (p.grantee, p.securable, p.ident.getOrElse(""), p.permission))
  }

  // ---------- DDL ----------

  def create(name: String, isUser: Boolean, password: Option[String],
             ifNotExists: Boolean = false): Long = {
    require(isUser || password.isEmpty,
      "Creating a ROLE with a password is not allowed")
    val prev = roles.putIfAbsent(name,
      Role(name, isUser, superuser = false, password, Vector.empty))
    if (prev != null) {
      if (ifNotExists) return 0L
      throw new IllegalArgumentException(
        s"Role '$name' already exists")
    }
    1L
  }

  def alterPassword(name: String, password: Option[String]): Long = {
    val r = require_(name)
    require(r.isUser || password.isEmpty,
      "Setting a password to a ROLE is not allowed")
    roles.put(name, r.copy(password = password))
    1L
  }

  def drop(name: String, ifExists: Boolean): Long = {
    val r = roles.get(name)
    if (r == null) {
      if (ifExists) return 0L
      throw new IllegalArgumentException(s"Role '$name' does not exist")
    }
    import scala.jdk.CollectionConverters._
    val dependents = roles.values.asScala.filter(_.granted.exists(_.role == name))
    require(dependents.isEmpty,
      s"Cannot drop ROLE: $name as it is granted on role: ${dependents.head.name}")
    roles.remove(name)
    privileges.keySet.asScala.filter(_._1 == name)
      .foreach(privileges.remove)
    1L
  }

  // ---------- GRANT / DENY / REVOKE ----------

  /** First GRANT flavour (also DENY): privileges on cluster/objects.
    * Returns the number of privilege entries affected, the reference's
    * row-count response (`role/TransportPrivileges.java`). */
  def applyPrivileges(policy: String, permissions: Seq[String],
                      securable: String, idents: Seq[Option[String]],
                      grantees: Seq[String], grantor: String): Long = {
    permissions.foreach(p => require(Permissions.contains(p),
      s"Unknown permission '$p'"))
    grantees.foreach(require_)
    var n = 0L
    for (g <- grantees; p <- permissions; ident <- idents) {
      val key = (g, p, securable, ident)
      policy match {
        case "REVOKE" => if (privileges.remove(key) != null) n += 1
        case st =>
          val prev = privileges.put(key, Privilege(g, grantor, st, p, securable, ident))
          if (prev == null || prev.state != st) n += 1
      }
    }
    n
  }

  /** Second GRANT flavour: grant roles to users/roles (inheritance).
    * Users cannot be granted; cycles are rejected
    * (`docs/sql/statements/grant.rst`, `role/RoleManager`). */
  def grantRoles(roleNames: Seq[String], grantees: Seq[String],
                 grantor: String): Long = {
    roleNames.foreach { rn =>
      val r = require_(rn)
      require(!r.isUser, s"Cannot grant a USER to other users or roles ('$rn')")
    }
    var n = 0L
    for (g <- grantees; rn <- roleNames) {
      val tgt = require_(g)
      require(g != rn, s"Cannot grant role $rn to itself")
      require(!parentClosure(rn).contains(g),
        s"Cannot grant role $rn to $g, $g is a parent role of $rn and a cyclic relation is not allowed")
      if (!tgt.granted.exists(_.role == rn)) {
        roles.put(g, tgt.copy(granted = tgt.granted :+ GrantedRole(rn, grantor)))
        n += 1
      }
    }
    n
  }

  def revokeRoles(roleNames: Seq[String], grantees: Seq[String]): Long = {
    var n = 0L
    for (g <- grantees; rn <- roleNames) {
      val tgt = require_(g)
      if (tgt.granted.exists(_.role == rn)) {
        roles.put(g, tgt.copy(granted = tgt.granted.filterNot(_.role == rn)))
        n += 1
      }
    }
    n
  }

  // ---------- resolution ----------

  /** Transitive parents of a role (reference `Roles.findAllParents`). */
  def parentClosure(name: String): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    def walk(n: String): Unit =
      find(n).toSeq.flatMap(_.granted).foreach { gr =>
        if (out.add(gr.role)) walk(gr.role)
      }
    walk(name)
    out.toSet
  }

  /** Per-role subject match with the securable ladder
    * (`role/RolePrivileges.java:121`): exact subject, else TABLE/VIEW falls
    * back to its schema, else CLUSTER. DENY found at the nearest defined
    * level wins. Returns GRANT | DENY | REVOKE (= undefined). */
  private def matchPrivilege(role: String, permission: String,
                             securable: String, ident: Option[String]): String = {
    def at(sec: String, id: Option[String]): Option[String] =
      Option(privileges.get((role, permission, sec, id))).map(_.state)
    val ladder: Seq[(String, Option[String])] = securable match {
      case "CLUSTER" => Seq(("CLUSTER", None))
      case "SCHEMA"  => Seq(("SCHEMA", ident), ("CLUSTER", None))
      case sec       => // TABLE | VIEW: table ident is schema.table; bare → doc
        val schema = ident.map(i =>
          if (i.contains('.')) i.substring(0, i.indexOf('.')) else "doc")
        Seq((sec, ident), ("SCHEMA", schema), ("CLUSTER", None))
    }
    ladder.iterator.map { case (s, i) => at(s, i) }
      .collectFirst { case Some(st) => st }
      .getOrElse("REVOKE")
  }

  /** Depth-first resolution over the inheritance graph
    * (`role/Roles.java:177`): own GRANT/DENY sticks; otherwise any parent
    * DENY dominates, else the first parent GRANT wins. */
  def resolve(roleName: String, permission: String, securable: String,
              ident: Option[String]): String = {
    find(roleName) match {
      case None => "REVOKE"
      case Some(r) if r.superuser => "GRANT"
      case Some(r) =>
        val own = matchPrivilege(roleName, permission, securable, ident)
        if (own == "GRANT" || own == "DENY") own
        else {
          var result = "REVOKE"
          for (parent <- r.granted.map(_.role)) {
            val p = resolve(parent, permission, securable, ident)
            if (p == "DENY") return "DENY"
            if (result == "REVOKE") result = p
          }
          result
        }
    }
  }

  /** A name absent from the registry is the process user — the engine's
    * implicit superuser, like the reference's built-in `crate` account
    * (grantees and SET SESSION AUTHORIZATION targets are validated at
    * write time, so unknown names only ever denote the process user). */
  def isSuperuser(name: String): Boolean =
    find(name).map(_.superuser).getOrElse(true)

  def hasPrivilege(user: String, permission: String, securable: String,
                   ident: Option[String]): Boolean =
    isSuperuser(user) || resolve(user, permission, securable, ident) == "GRANT"

  /** Any-permission check (reference `Roles.hasAnyPrivilege`), used by
    * catalog visibility. */
  def hasAnyPrivilege(user: String, securable: String,
                      ident: Option[String]): Boolean =
    isSuperuser(user) ||
      Permissions.exists(p => resolve(user, p, securable, ident) == "GRANT")

  // ---------- sys.* / information_schema views ----------

  /** `sys.users` (reference `role/metadata/SysUsersTableInfo.java:46`):
    * name, superuser, password placeholder, granted_roles as the
    * reference's array of {role, grantor} objects. The process user
    * leads as the superuser row, like the reference's `crate`. */
  def sysUsers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val process = spark.sparkContext.sparkUser
    val registered = all.filter(_.isUser)
    val rows = (if (registered.exists(_.name == process)) Nil
                else Seq((process, true, null: String, Seq.empty[GrantedRole]))) ++
      registered.map(r => (r.name, r.superuser,
        r.password.map(_ => "********").orNull,
        r.granted))
    rows.sortBy(_._1).toDF("name", "superuser", "password", "granted_roles")
  }

  /** `sys.roles` (reference `role/metadata/SysRolesTableInfo.java:40`). */
  def sysRoles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.filterNot(_.isUser)
      .map(r => (r.name, r.granted))
      .toDF("name", "granted_roles")
  }

  /** `sys.privileges`
    * (reference `role/metadata/SysPrivilegesTableInfo.java:43`). */
  def sysPrivileges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    allPrivileges
      .map(p => (p.grantee, p.grantor, p.state, p.permission, p.securable,
        p.ident.orNull))
      .toDF("grantee", "grantor", "state", "type", "class", "ident")
  }

  /** The effective session user: `SET SESSION AUTHORIZATION` overrides the
    * process user (reference `docs/sql/statements/
    * set-session-authorization.rst`; the authenticated user stays the
    * grantor of record for auditing). */
  def sessionUser(spark: SparkSession): String =
    spark.conf.getOption("graft.session.user")
      .getOrElse(spark.sparkContext.sparkUser)

  private def require_(name: String): Role =
    find(name).getOrElse(
      throw new IllegalArgumentException(s"Role '$name' does not exist"))
}
