package graft.queries

import graft.QueryDef

/** Single list of every operator query the driver verifies/benches.
  * Names must be unique; groups follow SURVEY.md §2 order.
  */
object Registry {
  def all: Seq[QueryDef] = {
    val groups: Seq[Seq[QueryDef]] = Seq(
      Relational.defs,
      Kernels.defs,
      StringQueries.defs,
      DatetimeQueries.defs,
      StructureQueries.defs,
      LlmQueries.defs,
      StreamingQueries.defs,
      ExtrasQueries.defs,
      SemanticsQueries.defs,
      AdvancedQueries.defs
    )
    val flat = groups.flatten
    require(flat.map(_.name).distinct.size == flat.size, "duplicate query names")
    flat
  }
}
