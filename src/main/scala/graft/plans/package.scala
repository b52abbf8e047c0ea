package graft

/** Custom Catalyst planner surface — deliberately EMPTY.
  *
  * SURVEY.md §4 concluded that nothing in the reference's semantics requires a
  * planner extension: every declared operator rides Catalyst built-ins, and the two
  * semantics Spark lacks whole-operator support for are expressed one rung lower on
  * the extension ladder instead (build-spec preference order):
  *
  *  - as-of join → composed from union + window with a single shuffle
  *    ([[graft.operators.AsOfJoin]]) — a custom LogicalPlan/Strategy/Exec would plan
  *    the same exchange + sort and add ~300 lines of planner surface for zero
  *    physical benefit;
  *  - hot scalar kernels → a native codegen'd Expression
  *    ([[graft.functions.DotProductFloat]]) and typed Aggregators
  *    ([[graft.functions.WelfordAgg]]).
  *
  * If a future operator genuinely needs whole-plan treatment (e.g. a range-join
  * band optimization), the recipe is: LogicalPlan node + resolution Rule + Strategy
  * + Exec, registered through SparkSessionExtensions — see the spark_guide pattern.
  * Until then, an empty package is the honest design: don't hand-schedule what the
  * optimizer already does.
  */
package object plans
