package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Config-driven pipeline topology — the reference's Oracle config plane
  * (`M_COMPONENT` MFramework.cpp:666-697, `M_QUEUE` :1073/:1401,
  * `M_LINKED_SESSIONS` :981-1011) re-expressed as a config RELATION the
  * engine loads from anywhere Spark reads: a JDBC table (the direct
  * analogue), a CSV/JSON file, a parquet snapshot. One row per stage:
  *
  *   stage | input_dir | format | transform_sql | output_dir | downstream
  *
  * `transform_sql` is ANSI SQL over the pseudo-view `__input` — the
  * config-selected per-stage logic, standing in for the reference's
  * DB-chosen plugin (`M_COMPONENT.SO_NAME`); SQL-as-config keeps the
  * whole stage declarative, so Catalyst optimizes straight through it.
  * `downstream` (nullable) names the next stage, like the reference's
  * linked-sessions chain; handoff is by files — downstream's `input_dir`
  * must BE this stage's `output_dir`, and load-time validation rejects a
  * mis-wired pair the way the reference's DB constraints would.
  *
  * Everything is validated BEFORE any stage starts: duplicate names,
  * dangling `downstream` references, handoff dir mismatches, and cycles
  * (the linked-session graph must be a DAG) all throw with the offending
  * stage named — a bad topology config must fail the deploy, not
  * half-start a pipeline.
  */
object Topology {

  final case class StageConf(
      stage: String, inputDir: String, format: String,
      transformSql: String, outputDir: String, downstream: Option[String])

  /** Pseudo-view name a stage's `transform_sql` selects from. */
  val InputView = "__input"

  private val RequiredCols =
    Seq("stage", "input_dir", "format", "transform_sql", "output_dir", "downstream")

  /** Parse + validate a config relation. Fails fast with the offending
    * stage named; see class doc for the checks. */
  def parse(config: DataFrame): Seq[StageConf] = {
    val missing = RequiredCols.filterNot(config.columns.map(_.toLowerCase).contains)
    require(missing.isEmpty, s"topology config lacks columns: ${missing.mkString(", ")}")
    val confs = config.select(RequiredCols.head, RequiredCols.tail: _*)
      .collect().toSeq.map { r: Row =>
        def s(i: Int, what: String): String = {
          require(!r.isNullAt(i) && r.getString(i).nonEmpty,
            s"topology row ${r} has empty $what")
          r.getString(i)
        }
        StageConf(s(0, "stage"), s(1, "input_dir"), s(2, "format"),
          s(3, "transform_sql"), s(4, "output_dir"),
          if (r.isNullAt(5) || r.getString(5).isEmpty) None else Some(r.getString(5)))
      }
    // stage names become temp-view and query names: a name that parses but
    // cannot start (e.g. 'my-stage' inside createOrReplaceTempView) would
    // defeat the fail-at-deploy contract — reject it here
    confs.foreach(c => require(c.stage.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"stage name '${c.stage}' must match [A-Za-z_][A-Za-z0-9_]* " +
        "(it names the stage's temp view and streaming query)"))
    val dups = confs.groupBy(_.stage).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate stage names: ${dups.mkString(", ")}")
    val byName = confs.map(c => c.stage -> c).toMap
    confs.foreach { c =>
      c.downstream.foreach { d =>
        val next = byName.getOrElse(d, throw new IllegalArgumentException(
          s"stage '${c.stage}' links to unknown downstream '$d'"))
        require(next.inputDir == c.outputDir,
          s"stage '${c.stage}' writes ${c.outputDir} but downstream '${d}' reads ${next.inputDir}")
      }
    }
    // cycle check over the downstream edges (DFS, colored)
    val color = scala.collection.mutable.Map[String, Int]() // 0 new, 1 open, 2 done
    def visit(n: String, path: List[String]): Unit = color.getOrElse(n, 0) match {
      case 2 =>
      case 1 => throw new IllegalArgumentException(
        s"topology cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
      case _ =>
        color(n) = 1
        byName(n).downstream.foreach(visit(_, n :: path))
        color(n) = 2
    }
    confs.foreach(c => visit(c.stage, Nil))
    confs
  }

  /** The per-stage LINEAGE view of a validated topology — the
    * auditable answer to "what runs, wired how?" that the reference's
    * operators read straight off M_LINKED_SESSIONS joins. The config
    * relation round-trips through [[parse]] (so every validation —
    * duplicate names, dangling links, handoff mismatches, cycles —
    * gates this view exactly as it gates a deploy), then each stage is
    * annotated with the DAG facts the wiring implies:
    *
    *   - `n_upstream`: how many stages feed it (0 = a source stage);
    *   - `depth`: the LONGEST hop distance from any source stage
    *     (well-defined — parse proved acyclicity);
    *   - `root`: the lexicographically-smallest source stage that
    *     reaches it (the chain/fan-in head, the "which pipeline is
    *     this" key);
    *   - `is_sink`: no downstream (the pipeline's terminal store).
    *
    * All computation is config-grain (|stages| rows collected, the
    * parse contract — the reference's M_* tables are likewise tiny),
    * returned as a DataFrame ordered by stage so the card is
    * oracle-comparable. */
  def lineage(spark: SparkSession, config: DataFrame): DataFrame = {
    val confs = parse(config)
    val byName = confs.map(c => c.stage -> c).toMap
    val upstreams = confs.flatMap(c => c.downstream.map(_ -> c.stage))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val memo = scala.collection.mutable.Map[String, (Long, String)]()
    def depthRoot(n: String): (Long, String) = memo.getOrElseUpdate(n,
      upstreams.get(n) match {
        case None => (0L, n)
        case Some(ups) =>
          val parents = ups.map(depthRoot)
          (parents.map(_._1).max + 1L, parents.map(_._2).min)
      })
    val rows = confs.map { c =>
      val (d, r) = depthRoot(c.stage)
      (c.stage, c.inputDir, c.outputDir, c.downstream.orNull,
        upstreams.get(c.stage).map(_.size.toLong).getOrElse(0L), d, r,
        c.downstream.isEmpty)
    }
    import spark.implicits._
    rows.toDF("stage", "input_dir", "output_dir", "downstream",
      "n_upstream", "depth", "root", "is_sink")
      .orderBy("stage")
  }

  /** Literal-safe identifier rewrite: replace word-boundary occurrences
    * of `from` with `to` everywhere EXCEPT inside single-quoted SQL
    * string literals, which pass through byte-identical. Honors both
    * Spark literal escapes (`''` doubling and backslash), so a quoted
    * `'__input'` — or `'it''s __input'` — survives the rewrite while the
    * table reference `FROM __input` is substituted. An identifier like
    * `x__input2` is untouched by the word boundary, as before. */
  private[graft] def rewriteOutsideLiterals(sql: String, from: String,
      to: String): String = {
    val pat = s"\\b$from\\b"
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        sb.append(sql.substring(segStart, i).replaceAll(pat, to))
        val litStart = i
        i += 1
        var closed = false
        while (i < sql.length && !closed) {
          sql.charAt(i) match {
            case '\\' => i += (if (i + 1 < sql.length) 2 else 1)
            case '\'' =>
              if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
              else { closed = true; i += 1 }
            case _ => i += 1
          }
        }
        sb.append(sql.substring(litStart, i))
        segStart = i
      } else i += 1
    }
    sb.append(sql.substring(segStart).replaceAll(pat, to))
    sb.toString
  }

  /** Build the [[StageSpec]] a config row describes: streaming source on
    * `input_dir`, the config SQL as the transform, streaming sink on
    * `output_dir` with a per-stage checkpoint under `checkpointRoot`. */
  def toSpec(spark: SparkSession, c: StageConf, checkpointRoot: String): StageSpec = {
    val view = s"${c.stage}${InputView}"
    StageSpec(
      c.stage,
      source = s => s.readStream.format(c.format)
        .schema(spark.read.format(c.format).load(c.inputDir).schema)
        .load(c.inputDir),
      transform = df => {
        df.createOrReplaceTempView(view)
        spark.sql(rewriteOutsideLiterals(c.transformSql, InputView, view))
      },
      sink = df => df.writeStream.format(c.format)
        .option("path", c.outputDir)
        .option("checkpointLocation", s"$checkpointRoot/${c.stage}")
        .outputMode("append"))
  }

  /** Wire a runner's unknown-stage path to this config plane: a control
    * `startsession` naming a stage the runner has never seen re-reads the
    * config relation (the thunk — a JDBC read picks up rows added since
    * deploy) and loads just that stage, mirroring the reference's DB
    * reload on an unknown control id (`m_HandleControlStart`,
    * `MFramework.cpp:1802-1812`). The WHOLE relation re-validates before
    * the stage starts: a config edit that broke the DAG fails the control
    * command, not the running pipeline. */
  def wireControlStart(spark: SparkSession, config: () => DataFrame,
      runner: PipelineRunner, checkpointRoot: String): Unit =
    runner.onUnknownStage { name =>
      parse(config()).find(_.stage == name).map(toSpec(spark, _, checkpointRoot))
    }

  /** Load a validated topology into a runner. Returns the stage names in
    * upstream-before-downstream order (start order: a consumer stage
    * started first would just idle until its producer runs, but starting
    * producers first makes the first end-to-end batch flow immediately). */
  def load(spark: SparkSession, config: DataFrame, runner: PipelineRunner,
      checkpointRoot: String): Seq[String] = {
    val confs = parse(config)
    confs.foreach(c => runner.register(toSpec(spark, c, checkpointRoot)))
    // topological order: repeatedly take stages all of whose upstreams are out
    val upstreamsOf = confs.flatMap(c => c.downstream.map(_ -> c.stage))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = scala.collection.mutable.LinkedHashSet[String]()
    val names = confs.map(_.stage)
    while (out.size < names.size)
      names.filterNot(out.contains)
        .filter(n => upstreamsOf.getOrElse(n, Nil).forall(out.contains))
        .foreach(out += _)
    out.toSeq
  }
}
