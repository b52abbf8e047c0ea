package graft

/** Custom Catalyst planner surface.
  *
  * SURVEY.md §4 concluded that almost nothing in the reference's semantics requires
  * a planner extension: every declared operator rides Catalyst built-ins, and two of
  * the three semantics Spark lacks whole-operator support for are expressed one rung
  * lower on the extension ladder instead (build-spec preference order):
  *
  *  - as-of join → composed from union + window with a single shuffle
  *    ([[graft.operators.AsOfJoin]]) — a custom LogicalPlan/Strategy/Exec would plan
  *    the same exchange + sort and add ~300 lines of planner surface for zero
  *    physical benefit;
  *  - hot scalar kernels → a native codegen'd Expression
  *    ([[graft.functions.DotProductFloat]]) and typed Aggregators
  *    ([[graft.functions.WelfordAgg]]).
  *
  * The third — pure band/interval joins, which Catalyst can only plan as O(n·m)
  * nested-loop joins — IS whole-plan work, and lives here:
  * [[graft.plans.IntervalJoinRewrite]], an optimizer `Rule[LogicalPlan]` that
  * rewrites band joins into bucketed equi-joins, registered through
  * `SparkSessionExtensions` ([[graft.plans.GraftSparkExtensions]]) or at runtime
  * ([[graft.plans.GraftExtensions]]). It kicks in for any user query — DataFrame or
  * `spark.sql` text — with no API opt-in, which is the point of doing it as a
  * planner rule rather than a helper function: don't make the user hand-schedule
  * what the optimizer can do.
  */
package object plans
