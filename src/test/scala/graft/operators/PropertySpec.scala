package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.model.OrderEvent
import graft.streaming.Processors

/** Property tests (SURVEY.md §5c): invariants that must hold for any
  * input — dedup idempotence, window containment, rate bounds, GMV
  * reconciliation. Generators are kept small (each case spins Spark
  * jobs); 10 cases per property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(10).withMaxSize(30)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val statusGen = Gen.oneOf("created", "approved", "invoiced",
    "processing", "shipped", "delivered", "unavailable", "canceled")

  private val eventsGen = Gen.listOf(for {
    id <- Gen.chooseNum(0, 40)
    orderId <- Gen.chooseNum(0, 20)
    status <- statusGen
    offsetSec <- Gen.chooseNum(0, 300)
  } yield (OrderEvent(s"e$id", "order_created", "t", s"o$orderId",
    Some(s"c$orderId"), Some(status), None, None, None),
    new Timestamp(1704103200000L + offsetSec * 1000L)))

  private def toDf(rows: List[(OrderEvent, Timestamp)]) =
    rows.toDF("e", "event_timestamp").select($"e.*", $"event_timestamp")

  test("dedup by event_id is idempotent and keeps one row per id") {
    check(Prop.forAll(eventsGen) { rows =>
      rows.isEmpty || {
        val df = toDf(rows)
        val once = df.dropDuplicates("event_id")
        val twice = once.dropDuplicates("event_id")
        once.count() == twice.count() &&
          once.count() == rows.map(_._1.event_id).distinct.size
      }
    })
  }

  test("funnel rates are within [0,100] and stages never exceed totals") {
    check(Prop.forAll(eventsGen) { rows =>
      rows.isEmpty || {
        val out = Processors.funnel(toDf(rows).dropDuplicates("event_id"))
          .select("total_orders", "orders_with_items", "orders_with_payment",
            "items_conversion_rate", "payment_conversion_rate")
          .as[(Long, Long, Long, Double, Double)].collect()
        out.forall { case (total, items, pay, ir, pr) =>
          items <= total && pay <= total &&
            ir >= 0 && ir <= 100 && pr >= 0 && pr <= 100
        }
      }
    })
  }

  test("sliding windows: every event lands in exactly width/slide windows") {
    check(Prop.forAll(eventsGen) { rows =>
      rows.isEmpty || {
        val df = toDf(rows).dropDuplicates("event_id")
        val n = df.count()
        val windowed = Windows.withSlidingWindow(df, "event_timestamp",
          "1 minute", "30 seconds")
        val contained = windowed.filter(
          unix_timestamp($"event_timestamp") < $"window_start" ||
            unix_timestamp($"event_timestamp") >= $"window_end").count() == 0
        windowed.count() == 2 * n && contained
      }
    })
  }

  // ---- prefix-filter completeness: the equivalence IS the theorem
  // (q86/q88's fixed fixtures verify known shapes; these generators
  // actively try to break the prefix bound with random corpora over a
  // tiny vocabulary, which maximizes shingle collisions, ties in the
  // df order, and boundary τ·|S| products) ----

  private val dedupVocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
  private val dedupCorpusGen = for {
    n <- Gen.chooseNum(2, 7)
    texts <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(3, 11)
      toks <- Gen.listOfN(len, Gen.oneOf(dedupVocab))
    } yield toks.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  private val tauGen = Gen.oneOf(0.3, 0.4, 0.5, 0.6, 0.75)

  // τ values straddling the exact ⌈τ·|S|⌉ integer boundaries for the
  // shingle-set sizes the corpus generator can produce (|S| ≤ 9 for
  // 3-shingles of ≤ 11 tokens): τ = m/s and τ = m/s ± ε. The prefix
  // length and the overlap bound both floor/ceil products of τ with
  // set sizes — an off-by-one-ulp there only shows up when τ·|S| sits
  // exactly on (or a hair off) an integer.
  private val boundaryTauGen = for {
    s <- Gen.chooseNum(2, 9)
    m <- Gen.chooseNum(1, s - 1)
    eps <- Gen.oneOf(-1e-9, 0.0, 1e-9)
  } yield math.min(0.95, math.max(0.05, m.toDouble / s + eps))

  test("prefix-filtered Jaccard ≡ all-pairs Jaccard on random corpora") {
    check(Prop.forAll(dedupCorpusGen, tauGen) { (rows, tau) =>
      val docs = rows.toDF("doc_id", "text")
      val full = TextDedup.jaccardPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val pref = TextDedup.prefixJaccardPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      pref == full
    })
  }

  test("prefix-filtered containment ≡ all-pairs containment on random corpora") {
    check(Prop.forAll(dedupCorpusGen, tauGen) { (rows, tau) =>
      val docs = rows.toDF("doc_id", "text")
      val full = TextDedup.containmentPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val pref = TextDedup.prefixContainmentPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      pref == full
    })
  }

  test("prefix-filtered Jaccard ≡ all-pairs at integer τ·|S| boundaries") {
    check(Prop.forAll(dedupCorpusGen, boundaryTauGen) { (rows, tau) =>
      val docs = rows.toDF("doc_id", "text")
      val full = TextDedup.jaccardPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val pref = TextDedup.prefixJaccardPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      pref == full
    })
  }

  test("prefix-filtered containment ≡ all-pairs at integer τ·|S| boundaries") {
    check(Prop.forAll(dedupCorpusGen, boundaryTauGen) { (rows, tau) =>
      val docs = rows.toDF("doc_id", "text")
      val full = TextDedup.containmentPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      val pref = TextDedup.prefixContainmentPairs(docs, n = 3, threshold = tau)
        .as[(Long, Long, Double)].collect().toSet
      pref == full
    })
  }

  test("url host/domain extraction recovers components of random built URLs") {
    import graft.functions.UrlFunctions
    val labelGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "ftp")
      nLab <- Gen.chooseNum(1, 4)
      labs <- Gen.listOfN(nLab, labelGen)
      user <- Gen.option(labelGen)
      port <- Gen.option(Gen.chooseNum(1, 65535))
      path <- Gen.option(labelGen)
      query <- Gen.option(labelGen)
      upper <- Gen.oneOf(true, false)
    } yield {
      val hostLower = labs.mkString(".")
      val host = if (upper) hostLower.toUpperCase else hostLower
      val url = scheme + "://" + user.map(_ + "@").getOrElse("") + host +
        port.map(":" + _).getOrElse("") + path.map("/" + _).getOrElse("") +
        query.map("?q=" + _).getOrElse("")
      val dom =
        if (labs.length >= 2) labs.takeRight(2).mkString(".") else hostLower
      (url, hostLower, dom)
    }
    check(Prop.forAll(Gen.nonEmptyListOf(urlGen)) { rows =>
      val got = rows.toDF("url", "eh", "ed")
        .select(col("eh"), col("ed"), UrlFunctions.host(col("url")).as("h"))
        .withColumn("d", UrlFunctions.registeredDomain(col("h")))
        .as[(String, String, String, String)].collect()
      got.forall { case (eh, ed, h, d) => h == eh && d == ed }
    })
  }

  // Random documents-shaped corpora for the q130 funnel invariants:
  // a small text pool (so exact duplicates occur and the dedup stage
  // has work), sources spanning the blocklisted domains, and word
  // mixes straddling every quality-rule threshold (stopword-free
  // texts, short texts, low-TTR repetition).
  private val funnelCorpusGen: Gen[List[(Long, String, String, String, Long)]] = {
    val contentWords = Seq("data", "pipeline", "spark", "model", "train",
      "corpus", "quality", "tokens", "filter", "sample", "xylophone")
    val stopWords = Seq("the", "of", "is", "and", "a")
    val textGen = for {
      nWords <- Gen.chooseNum(3, 45)
      stops <- Gen.chooseNum(0, 6)
      repeatOne <- Gen.oneOf(true, false) // low-TTR case
      words <- Gen.listOfN(nWords, Gen.oneOf(contentWords))
    } yield {
      val base = if (repeatOne) List.fill(nWords)(words.head) else words
      (base ++ List.fill(stops)(stopWords(stops % stopWords.size)))
        .mkString(" ")
    }
    for {
      nTexts <- Gen.chooseNum(1, 6)
      pool <- Gen.listOfN(nTexts, textGen)
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        t <- Gen.oneOf(pool)
        src <- Gen.chooseNum(0, 15).map(i => s"src$i")
        lang <- Gen.oneOf("en", "de", "es")
      } yield (t, src, lang))
    } yield rows.zipWithIndex.map { case ((t, s, l), i) =>
      (i.toLong, t, l, s, t.length.toLong)
    }
  }

  test("q130 funnel invariants hold on random corpora") {
    import graft.queries.CurationQueries
    check(Prop.forAll(funnelCorpusGen) { rows =>
      rows.isEmpty || {
        val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        val f = CurationQueries.funnelFlags(d)
          .select(col("domain"), col("fp"),
            col("s2"), col("s3"), col("s4"), col("s5"))
          .as[(String, String, Boolean, Boolean, Boolean, Boolean)]
          .collect()
        // stage membership is a chain: s5 ⊆ s4 ⊆ s3 ⊆ s2 — so the
        // survivor counts are monotone non-increasing by construction
        val chain = f.forall { case (_, _, s2, s3, s4, s5) =>
          (!s5 || s4) && (!s4 || s3) && (!s3 || s2)
        }
        // per-domain quota: at most QuotaK docs survive stage 4 per
        // domain (counted among stage-3 SURVIVORS, not all docs)
        val quota = f.groupBy(_._1).forall { case (_, g) =>
          g.count(_._4) <= CurationQueries.QuotaK
        }
        // dedup keeps EXACTLY one doc per fingerprint that has any
        // stage-4 survivor — never zero, never two
        val dedup = f.groupBy(_._2).forall { case (_, g) =>
          val kept = g.count(_._6)
          if (g.exists(_._5)) kept == 1 else kept == 0
        }
        // blocklist actually blocks: no surviving doc has a
        // blocklisted domain
        val blocked = f.forall { case (dom, _, s2, _, _, _) =>
          !s2 == CurationQueries.DomainBlocklist.contains(dom)
        }
        chain && quota && dedup && blocked
      }
    })
  }

  test("GMV reconciliation: windowed sums add to 2x total value") {
    val itemsGen = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0, 1000)
      price <- Gen.chooseNum(1, 10000)
      offsetSec <- Gen.chooseNum(0, 300)
    } yield (s"i$id", price.toDouble / 100, 2.0,
      new Timestamp(1704103200000L + offsetSec * 1000L)))
    check(Prop.forAll(itemsGen) { rows =>
      val df = rows.toDF("event_id", "price", "freight_value", "event_timestamp")
        .dropDuplicates("event_id")
      val expected = df.select("price", "freight_value").as[(Double, Double)]
        .collect().map { case (p, f) => p + f }.sum
      val windowedTotal = df
        .withColumn("total_value", $"price" + $"freight_value")
        .groupBy(window($"event_timestamp", "1 minute", "30 seconds"))
        .agg(sum($"total_value").as("gmv"))
        .agg(sum($"gmv")).as[Double].collect().head
      math.abs(windowedTotal - 2 * expected) < 1e-6
    })
  }
}
