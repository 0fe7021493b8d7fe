package graft.logic

/** Logic-variable conventions, mirroring the reference semantics
  * (cascalog-core/src/clj/cascalog/logic/vars.clj:81-112):
  *
  *  - `?x`  non-nullable binding var — null tuples filtered wherever it binds
  *  - `!x`  nullable binding var — nulls pass through
  *  - `!!x` ungrounding var — nullable AND makes its branch un-ground,
  *          which drives outer-join selection at merge time
  *  - `_`   wildcard — position ignored (uniquified to a fresh nullable var)
  *  - anything else — a constant: implicit equality filter (input position)
  *          or equality constraint on an op result (output position)
  */
object Vars {
  private val fresh = new java.util.concurrent.atomic.AtomicLong(0)

  def isVarName(s: String): Boolean =
    s.startsWith("?") || s.startsWith("!") || s == "_" || s.startsWith("_g")

  /** Is this item a logic var (vs a constant)? Only strings can be vars. */
  def isVar(item: Any): Boolean = item match {
    case s: String => isVarName(s)
    case _         => false
  }

  def isWildcard(item: Any): Boolean = item == "_"

  def isNonNullable(v: String): Boolean = v.startsWith("?")

  def isNullable(v: String): Boolean = v.startsWith("!") && !v.startsWith("!!")

  /** Ungrounding vars (`!!x`) switch their branch's join type to outer
    * (reference: logic/parse.clj:450-456). */
  def isUnground(v: String): Boolean = v.startsWith("!!")

  def isGroundVar(v: String): Boolean = !isUnground(v)

  /** Fresh nullable var — used for wildcards and constant substitution. */
  def gen(): String = s"_g${fresh.incrementAndGet()}"

  /** Reserved trap-error var prefix: the planner recognizes trapped ops
    * by it (Planner filter/divert sites) — every constructor of a
    * trapped op MUST mint the var here so the naming contract has one
    * owner (dsl.TrappedCall and japi trappedOp both do). */
  val TrapPrefix = "!__trap"
  def genTrapVar(): String = s"$TrapPrefix${gen().drop(2)}"
  def isTrapVar(v: String): Boolean = v.startsWith(TrapPrefix)

  /** Spark column names may not contain backtick/dot safely; map a logic var
    * to a stable legal column name. `?x`/`!x`/`!!x` all keep distinct names.
    */
  def colName(v: String): String = v
    .replace("!!", "__uu_")
    .replace("!", "__n_")
    .replace("?", "__q_")

  /** Output column name for final projection: strip the sigil. */
  def displayName(v: String): String =
    if (v.startsWith("!!")) v.drop(2)
    else if (v.startsWith("?") || v.startsWith("!")) v.drop(1)
    else v
}
