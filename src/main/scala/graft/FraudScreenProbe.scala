package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composed fraud-screen probe: plant three DISTINCT bot species among
  * a large synthetic caller population and verify the screen family
  * separates them — each detector fires on EXACTLY its species, never
  * on the normals, never on each other's plants — at volume, with
  * throughput recorded.
  *
  * Species (20 plants each among `callers` normal subscribers):
  *  - CADENCE bots: clockwork 60-second spacing, normal fan-out and
  *    durations → only [[graft.queries.RoutingQ.botCadenceCard]]
  *    (relative-MAD ≈ 0) fires.
  *  - WANGIRI bots: every attempt to a FRESH callee, zero talk time,
  *    irregular spacing → only [[graft.queries.RoutingQ.wangiriCard]]
  *    (fan-out + unanswered share) fires.
  *  - VELOCITY bursters: a 120-call burst inside one minute with 0/1s
  *    gaps → only [[graft.queries.AnalyticsQ.velocityFlags]] fires
  *    (their 0-gap median exempts them from the cadence flag by
  *    design — zero-median bursts are the velocity monitor's domain).
  *
  * Normal traffic: per-caller pseudo-random gaps (1..600 s via a
  * multiplicative hash — irregular, relative MAD far above the knob),
  * a 5-callee calling circle (fan-out 10%), positive durations.
  *
  * Env knobs: SPARK_GRAFT_FRAUD_CDRS (default 5,000,000 — calls from
  * normals; plants add ~34k), SPARK_GRAFT_FRAUD_CALLERS (100,000),
  * SPARK_GRAFT_CPUS.
  */
object FraudScreenProbe {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val totalCdrs = sys.env.getOrElse("SPARK_GRAFT_FRAUD_CDRS",
      "5000000").toLong
    val nCallers = sys.env.getOrElse("SPARK_GRAFT_FRAUD_CALLERS",
      "100000").toLong
    val perCaller = math.max(totalCdrs / nCallers, 20L)
    val spark = core.GraftSession.builder(s"local[$cpus]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val plants = 20L
    val cadence0 = nCallers; val wangiri0 = nCallers + plants
    val burst0 = nCallers + 2 * plants
    // deterministic multiplicative hash; the inner pmod keeps the
    // product under 2^63 (ANSI overflow), the outer one non-negative
    def h(e: String) =
      s"pmod(pmod($e, 1000000007L) * 2654435761L, 1000000007L)"

    // normals: 300 s stride + sub-stride jitter → monotone timestamps
    // whose consecutive gaps are irregular in (0, 600) — relative MAD
    // far above the cadence knob; 5-callee circle; talkative
    val normals = spark.range(0L, nCallers * perCaller).select(
      expr(s"id DIV $perCaller").as("caller"),
      expr(s"id % $perCaller").as("i"))
      .select(col("caller"), col("i"),
        expr(s"caller % 86400L + i * 300L + " +
          s"${h("caller * 131071L + i * i")} % 300L").as("sec"),
        expr(s"caller * 31L + (i % 5L)").as("callee"),
        expr(s"100L + ${h("caller * 7L + i")} % 6000L").as("dur_centi"))
    // cadence bots: exact 60 s clockwork, normal circle + durations
    val cadence = spark.range(0L, plants * 500L).select(
      (lit(cadence0) + expr("id DIV 500")).as("caller"),
      expr("id % 500").as("i"))
      .select(col("caller"), col("i"), (col("i") * 60L).as("sec"),
        (col("caller") * 31L + pmod(col("i"), lit(5L))).as("callee"),
        lit(3000L).as("dur_centi"))
    // wangiri: fresh callee every attempt, ring-outs, irregular gaps
    val wangiri = spark.range(0L, plants * 500L).select(
      (lit(wangiri0) + expr("id DIV 500")).as("caller"),
      expr("id % 500").as("i"))
      .select(col("caller"), col("i"),
        expr(s"i * 300L + ${h("caller * 524287L + i * i")} % 300L").as("sec"),
        (col("caller") * 100000L + col("i")).as("callee"),
        lit(0L).as("dur_centi"))
    // velocity bursters: 120 calls with 0/1 s gaps, then silence
    val burst = spark.range(0L, plants * 120L).select(
      (lit(burst0) + expr("id DIV 120")).as("caller"),
      expr("id % 120").as("i"))
      .select(col("caller"), col("i"),
        // the whole burst lands inside one minute: any trailing-60s
        // window sees all 120 calls, and the sorted gaps' median is 0
        // (exempting bursters from the cadence flag by design)
        expr(s"1000L + ${h("caller + i")} % 60L").as("sec"),
        (col("caller") * 31L + pmod(col("i"), lit(5L))).as("callee"),
        lit(3000L).as("dur_centi"))

    val cdrs = normals.unionByName(cadence).unionByName(wangiri)
      .unionByName(burst)
      .select(col("caller"), col("sec"), col("callee"), col("dur_centi"))
      .localCheckpoint() // materialize the corpus once; screens re-scan it
    val n = cdrs.count()
    println(s"[fraud] corpus: $n CDRs, $nCallers normal callers + " +
      s"${3 * plants} plants, $perCaller calls/normal")

    def callerSet(df: DataFrame, c: String = "caller"): Set[Long] =
      df.select(col(c).cast(LongType)).distinct().as[Long].collect().toSet
    val cadenceSet = (cadence0 until cadence0 + plants).toSet
    val wangiriSet = (wangiri0 until wangiri0 + plants).toSet
    val burstSet = (burst0 until burst0 + plants).toSet

    // --- wangiri screen ---------------------------------------------------
    val (tw, wFlags) = time {
      callerSet(queries.RoutingQ.wangiriCard(
        cdrs.select(col("caller"),
          col("callee").cast(StringType).as("callee"), col("dur_centi")),
        minAttempts = 100L, minFanoutPpm = 800000L, minBadPpm = 900000L)
        .filter(col("wangiri_flag")))
    }
    println(f"[fraud] wangiriCard: $tw%.1fs, flagged ${wFlags.size} " +
      s"(exact=${wFlags == wangiriSet})")
    require(wFlags == wangiriSet,
      s"wangiri screen: expected $wangiriSet got $wFlags")

    // --- cadence screen ---------------------------------------------------
    val (tc, cFlags) = time {
      // minEvents DERIVED from perCaller (advice-r12): with the old
      // fixed 100 > perCaller=50, normals failed the event floor alone
      // and the probe never exercised the relative-MAD discrimination
      // it claims (and raising SPARK_GRAFT_FRAUD_CDRS silently changed
      // what it proves). At perCaller/2 every normal caller PASSES the
      // floor (perCaller−1 gaps) and is separated only by the MAD knob
      // (normals' rel-MAD ≈ 250–500‰ vs the 50‰ gate; bursters stay
      // exempt via the median_iet_sec > 0 guard, median gap 0).
      callerSet(queries.RoutingQ.botCadenceCard(
        cdrs.select(col("caller"), col("sec")),
        minEvents = math.max(perCaller / 2, 2L), maxRelMadMilli = 50L)
        .filter(col("machine_flag")))
    }
    println(f"[fraud] botCadenceCard: $tc%.1fs, flagged ${cFlags.size} " +
      s"(exact=${cFlags == cadenceSet})")
    require(cFlags == cadenceSet,
      s"cadence screen: expected $cadenceSet got $cFlags")

    // --- velocity screen --------------------------------------------------
    val (tv, vFlags) = time {
      callerSet(queries.AnalyticsQ.velocityFlags(
        cdrs.select(col("sec").as("event_id"), col("caller").as("user_id"),
          col("sec").cast(TimestampType).as("ts")),
        windowSec = 60L, threshold = 60L), "user_id")
    }
    println(f"[fraud] velocityFlags: $tv%.1fs, flagged ${vFlags.size} " +
      s"(exact=${vFlags == burstSet})")
    require(vFlags == burstSet,
      s"velocity screen: expected $burstSet got $vFlags")

    val total = tw + tc + tv
    println(f"[fraud] all three screens exact over $n CDRs in " +
      f"$total%.1fs = ${n / total}%.0f CDRs/s per-screen-sweep")
    spark.stop()
  }
}
