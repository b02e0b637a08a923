package graft.queries

/** Embedding similarity operators (SURVEY §2C) — filled in next batch. */
object VectorQ {
  val queries: Seq[GQuery] = Seq()
}
