package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQ

/** Dev probe pinning q237_lsh_calibration's 10× ratio: under the
  * ScaleProbe replica every document has 9 exact copies, so the
  * candidate set grows ~K²/2 per duplicate family (each replica pairs
  * with every other) and EVERY candidate pays the banded edit kernel on
  * full texts — the confirm stage's work is candidate-sized by design,
  * so candidate-count growth IS the wall growth. This prints candidate
  * counts and wall at 1× and 10× so the ratio's owner is a measured
  * number (wall-per-candidate), not an attribution.
  */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq("1x" -> oneX, "10x" -> tenX).foreach { case (label, dir) =>
      val docs = core.Tables.load(spark, dir, "documents")
      val nCand = TextQ.lshCandidates(TextQ.minhashBands(docs))
        .filter(col("est_jaccard") >= 0.25).count()
      def card(): Unit =
        TextQ.lshCalibration(docs).write.format("noop")
          .mode("overwrite").save()
      card() // warm
      val t = Seq.fill(2)(time(card())).min
      println(f"calibration $label candidates=$nCand wall=$t%.2fs " +
        f"us_per_cand=${t * 1e6 / math.max(nCand, 1)}%.1f")
    }
    spark.stop()
  }
}
