package graft

import org.apache.spark.sql.functions._

import graft.core.GrainGuard
import graft.functions.Aggregators
import graft.queries.AnalyticsQ

/** Round-15 kernels: the O(d log d) Kendall/Mann-Kendall re-plan (the
  * round-14 design watch) and the loud grain guards for the
  * bounded-collect class. Randomized equivalence of the re-planned
  * operators against in-memory pair counts lives in Round14PropertySpec
  * (unchanged contracts, new plan under them). */
class Round15OpsSpec extends SparkSpec {

  import spark.implicits._

  test("kendallTauSeries handles multiple groups with mixed tie shapes " +
      "and keeps a single-observation group as a NULL-stats row") {
    // g1: strictly concordant; g2: one obs; g3: all-tied x
    val df = Seq(
      ("g1", 1L, 1L, 10L), ("g1", 2L, 2L, 20L), ("g1", 3L, 3L, 30L),
      ("g2", 1L, 5L, 5L),
      ("g3", 1L, 7L, 1L), ("g3", 2L, 7L, 2L), ("g3", 3L, 7L, 2L))
      .toDF("g", "o", "x", "y")
    val got = AnalyticsQ.kendallTauSeries(df, "g", "o", "x", "y")
      .orderBy(col("g"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("g1", 3L, Some(3L), Some(3L), Some(0L), Some(0L), Some(0L),
        Some(0L), Some(1000000L)),
      ("g2", 1L, None, None, None, None, None, None, None),
      // g3: pairs (1,2),(1,3) tie x only; (2,3) ties both
      ("g3", 3L, Some(3L), Some(0L), Some(0L), Some(2L), Some(0L),
        Some(1L), Some(0L))), got.toString)
  }

  test("the pair partition identity C + D + ties = n(n-1)/2 holds on a " +
      "tie-heavy series and matches the brute-force count") {
    val rows = Seq.tabulate(40)(i =>
      ((i * 7) % 5).toLong -> ((i * 3) % 4).toLong)
    val df = rows.zipWithIndex
      .map { case ((x, y), i) => ("g", i.toLong, x, y) }
      .toDF("g", "o", "x", "y")
    val got = AnalyticsQ.kendallTauSeries(df, "g", "o", "x", "y")
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"), col("ties_xy"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val pairs = for { i <- rows.indices; j <- rows.indices if i < j }
      yield (java.lang.Long.signum(rows(j)._1 - rows(i)._1),
        java.lang.Long.signum(rows(j)._2 - rows(i)._2))
    val exp = (pairs.size.toLong,
      pairs.count(p => p._1 * p._2 > 0).toLong,
      pairs.count(p => p._1 * p._2 < 0).toLong,
      pairs.count(p => p._1 == 0 && p._2 != 0).toLong,
      pairs.count(p => p._2 == 0 && p._1 != 0).toLong,
      pairs.count(p => p._1 == 0 && p._2 == 0).toLong)
    assert(got == exp, s"got $got, expected $exp")
    assert(got._2 + got._3 + got._4 + got._5 + got._6 == got._1)
  }

  test("duplicate ord values within a group fail loudly naming the " +
      "series-grain contract (the old plan dropped those pairs silently)") {
    val df = Seq(("g", 1L, 1L, 1L), ("g", 1L, 2L, 2L), ("g", 2L, 3L, 3L))
      .toDF("g", "o", "x", "y")
    val e = intercept[Exception] {
      AnalyticsQ.kendallTauSeries(df, "g", "o", "x", "y").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("SERIES grain")),
      s"error did not name the grain contract: ${chain(e)}")
  }

  test("the KendallPairs cap fails loudly naming graft.grain.maxSeriesLen " +
      "before the buffer can grow event-sized") {
    val agg = new Aggregators.KendallPairs(3, "testOp")
    var buf = agg.zero
    buf = agg.reduce(buf, Aggregators.SeriesPoint(1, 1, 1))
    buf = agg.reduce(buf, Aggregators.SeriesPoint(2, 2, 2))
    buf = agg.reduce(buf, Aggregators.SeriesPoint(3, 3, 3))
    val e = intercept[IllegalArgumentException] {
      agg.reduce(buf, Aggregators.SeriesPoint(4, 4, 4))
    }
    assert(e.getMessage.contains("graft.grain.maxSeriesLen") &&
      e.getMessage.contains("testOp"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] { agg.merge(buf, buf) }
    assert(e2.getMessage.contains("graft.grain.maxSeriesLen"), e2.getMessage)
  }

  test("GrainGuard.checked raises the named grain error on an " +
      "over-cap collected series and passes a compliant one through") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L))
      .toDF("g", "x")
    val ok = df.groupBy(col("g"))
      .agg(GrainGuard.checked(sort_array(collect_list(col("x"))),
        "specOp", cap = 10).as("s"))
      .select(size(col("s"))).as[Int].head()
    assert(ok == 4)
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(GrainGuard.checked(sort_array(collect_list(col("x"))),
          "specOp", cap = 3).as("s"))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null &&
      m.contains("graft.grain.maxSeriesLen") && m.contains("specOp")),
      s"guard error missing contract text: ${chain(e)}")
  }

  test("ewmaChart under the default cap is unaffected by the guard") {
    val df = Seq(("g", 1L, 100L), ("g", 2L, 110L), ("g", 3L, 90L))
      .toDF("g", "o", "x")
    val out = AnalyticsQ.ewmaChart(df, "g", "o", "x")
    assert(out.count() == 3L)
  }

  test("URL canonicalization is idempotent, param-order-invariant, and " +
      "its output honors every canonical invariant on arbitrary URLs") {
    import org.scalacheck.Gen
    val label = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
      .flatMap(s => Gen.oneOf(s.toLowerCase, s.toUpperCase, s))
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "hTTpS")
      labs <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, label))
      tld <- Gen.oneOf("com", "COM", "org", "co.uk", "CO.UK")
      port <- Gen.oneOf("", ":80", ":443", ":8080", ":9")
      path <- Gen.oneOf("", "/", "/a", "/a/b.html")
      names <- Gen.someOf(Seq("a", "b", "z9", "utm_source",
        "utm_campaign", "gclid", "ref"))
      perm <- Gen.const(scala.util.Random.shuffle(names.toList))
      frag <- Gen.oneOf("", "#x", "#sec/2")
    } yield {
      val q = if (names.isEmpty) ""
        else "?" + names.map(n => s"$n=v$n").mkString("&")
      val q2 = if (perm.isEmpty) ""
        else "?" + perm.map(n => s"$n=v$n").mkString("&")
      val host = (labs :+ tld).mkString(".")
      (s"$scheme://$host$port$path$q$frag",
        s"$scheme://$host$port$path$q2$frag")
    }
    val urls = Gen.listOfN(120, gen).sample.get
    val rows = urls.toDF("u1", "u2")
      .select(col("u1"),
        graft.queries.CrawlQ.canonicalUrl("u1").as("c1"),
        graft.queries.CrawlQ.canonicalUrl("u2").as("c2"))
      .withColumn("cc", graft.queries.CrawlQ.canonicalUrl("c1"))
      .withColumn("dom", graft.queries.CrawlQ.urlDomain("u1"))
      .collect()
    rows.foreach { r =>
      val (u1, c1, c2, cc, dom) = (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3), r.getString(4))
      assert(cc == c1, s"not idempotent: $u1 -> $c1 -> $cc")
      assert(c2 == c1, s"param order leaked: $u1 -> $c1 vs $c2")
      assert(!c1.contains("#"), s"fragment survived: $c1")
      assert(!c1.contains("utm_") && !c1.contains("gclid"),
        s"tracking param survived: $c1")
      val scheme = c1.takeWhile(_ != ':')
      assert(scheme == scheme.toLowerCase, s"scheme case: $c1")
      assert(!(scheme == "http" && c1.contains(":80/")) &&
        !(scheme == "https" && c1.contains(":443/")),
        s"default port survived: $c1")
      assert(dom == dom.toLowerCase && dom.split("[.]").length >= 2,
        s"bad domain: $dom from $u1")
    }
    // multi-part suffix: the co.uk host keeps three labels
    val d = Seq(("http://A.B.Example.CO.UK/x", 0))
      .toDF("u", "i")
      .select(graft.queries.CrawlQ.urlDomain("u")).as[String].head()
    assert(d == "example.co.uk", d)
  }

  test("mannKendallTest matches a hand-computed S on a multi-group " +
      "series with ties") {
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 3L), ("up", 4L, 4L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L))
      .toDF("g", "o", "x")
    val got = AnalyticsQ.mannKendallTest(df, "g", "o", "x")
      .orderBy(col("g"))
      .select(col("g"), col("n_obs"), col("s_stat"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("flat", 3L, 0L), ("up", 4L, 6L)), got.toString)
  }

  test("robotsScreen: longest prefix wins, allow wins a length tie, " +
      "and a domain with no rules defaults to allowed with no match") {
    import graft.queries.CrawlQ
    val docs = Seq(
      (1L, "http://a.com/art/15"),   // /art/1 (deny) overrides /art/ (allow)
      (2L, "http://a.com/art/9"),    // only /art/ matches -> allow
      (3L, "http://a.com/tie"),      // /tie deny vs /tie allow -> allow wins
      (4L, "http://b.org/x"),        // no rules for b.org -> default allow
      (5L, "http://a.com/zzz"))      // only root '/' matches -> allow
      .toDF("doc_id", "url")
    val rules = Seq(
      ("a.com", "/", true),
      ("a.com", "/art/", true),
      ("a.com", "/art/1", false),
      ("a.com", "/tie", false),
      ("a.com", "/tie", true))
      .toDF("domain", "prefix", "allow")
    val got = CrawlQ.robotsScreen(docs, "url", rules)
      .select(col("doc_id"), col("matched_prefix"), col("allowed"))
      .orderBy(col("doc_id"))
      .as[(Long, Option[String], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some("/art/1"), false),
      (2L, Some("/art/"), true),
      (3L, Some("/tie"), true),
      (4L, None, true),
      (5L, Some("/"), true)), got.toString)
  }

  test("politenessCard: range-frame burst counts respect the window " +
      "boundary, count same-second peers, and tally over-cap events") {
    import graft.queries.CrawlQ
    // h1: 0, 59 (inside one 60s window), 119 (its window [60,119]
    //     excludes 59) -> bursts 1,2,1; h2: 0, 60 (outside) -> 1,1;
    // h3: three at the same second -> RANGE peers all count: 3,3,3
    val f = Seq(
      ("h1", 0L), ("h1", 59L), ("h1", 119L),
      ("h2", 0L), ("h2", 60L),
      ("h3", 7L), ("h3", 7L), ("h3", 7L))
      .toDF("host", "sec")
    val got = CrawlQ.politenessCard(f, "host", "sec", cap = 1)
      .orderBy(col("host"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("h1", 3L, 2L, 1L, false),
      ("h2", 2L, 1L, 0L, true),
      ("h3", 3L, 3L, 3L, false)), got.toString)
    // cap 3 flips h3 compliant
    val got3 = CrawlQ.politenessCard(f, "host", "sec", cap = 3)
      .orderBy(col("host"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got3.map(r => (r._1, r._5)) ==
      Seq(("h1", true), ("h2", true), ("h3", true)), got3.toString)
  }

  test("fetch funnel ordering: robots runs before dedup, so a blocked " +
      "lower-id doc never holds a canonical keeper slot") {
    import graft.queries.CrawlQ
    // doc 1 (lowest id — would win any dedup it enters) and doc 3
    // share a canonical URL; doc 1 sits on a denied prefix. With
    // robots FIRST, doc 3 keeps its resource; dedup-first would have
    // crowned blocked doc 1 the keeper and then lost the resource
    // entirely when robots killed it.
    val docs = Seq(
      (1L, "http://a.com/p/x?b=2&a=1"),          // denied by /p
      (2L, "http://a.com/q?x=1"),                // allowed, distinct
      (3L, "HTTP://A.COM:80/p/x?a=1&b=2"))       // same canon as 1...
      .toDF("doc_id", "url")
    val rules = Seq(
      ("a.com", "/", true),
      ("a.com", "/p", false),
      ("a.com", "/p/x", true))                    // ...but re-allowed deeper
      .toDF("domain", "prefix", "allow")
    // longest match: /p/x (allow) beats /p (deny) -> 1 and 3 allowed
    // here; tighten to the deny-only case by dropping the override
    val denyOnly = rules.filter(col("prefix") =!= "/p/x")
    val allowedIds = CrawlQ.robotsScreen(docs, "url", denyOnly)
      .filter(col("allowed")).select(col("doc_id"))
    val allowed = docs.join(allowedIds, Seq("doc_id"), "left_semi")
    val keepers = CrawlQ.canonicalUrlDedup(allowed, "url")
      .select(col("keeper")).as[Long].collect().toSet
    assert(keepers == Set(2L), keepers.toString)
    // with the deeper re-allow in force, the blocked pair returns and
    // the lower id takes the slot back
    val allowedIds2 = CrawlQ.robotsScreen(docs, "url", rules)
      .filter(col("allowed")).select(col("doc_id"))
    val keepers2 = CrawlQ.canonicalUrlDedup(
        docs.join(allowedIds2, Seq("doc_id"), "left_semi"), "url")
      .select(col("keeper")).as[Long].collect().toSet
    assert(keepers2 == Set(1L, 2L), keepers2.toString)
  }
}
