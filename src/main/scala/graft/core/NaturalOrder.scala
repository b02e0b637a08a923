package graft.core

/** Natural (digit-runs-compared-numerically) name ordering, shared by
  * every consumer of producer-named files: the control ingress dispatch
  * and the packet-queue arrival order. Lexicographic order silently
  * violates the monotone-name producer contract at width rollover
  * (`p10` sorts before `p9`), which for a queue offset means a consumed
  * prefix that SHIFTS across restarts — packets skipped or replayed.
  * Natural order makes unpadded monotone names safe.
  */
object NaturalOrder {

  /** Sort key treating digit runs as numbers: cmd_9 < cmd_10 (each digit
    * run is left-padded to a fixed width in the comparison key). */
  def key(s: String): String =
    """\d+""".r.replaceAllIn(s, m => f"${BigInt(m.matched)}%040d")
}
