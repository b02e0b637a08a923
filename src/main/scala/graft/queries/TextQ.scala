package graft.queries

/** Text-analysis & dedup operators (SURVEY §2C) — filled in next batch. */
object TextQ {
  val queries: Seq[GQuery] = Seq()
}
