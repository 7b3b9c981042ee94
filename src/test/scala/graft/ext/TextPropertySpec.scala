package graft.ext

import scala.util.Random

import graft.SparkSpec

/** Property-style invariants over randomized corpora (seeded —
  * reproducible) for the chunking / packing / repetition operators. */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(rnd: Random, n: Int): Seq[(Long, String)] =
    (1L to n).map { i =>
      val len = rnd.nextInt(40) + 1
      val words = Seq.fill(len)(s"w${rnd.nextInt(12)}")
      (i, words.mkString(" "))
    }

  test("chunk: full coverage, stride-aligned starts, exact reconstruction") {
    val rnd = new Random(7)
    for (round <- 1 to 4) {
      val chunkSize = rnd.nextInt(8) + 3
      val overlap = rnd.nextInt(chunkSize - 1)
      val stride = chunkSize - overlap
      val docs = randomCorpus(rnd, 30)
      val chunks = TextAnalysis
        .chunk(docs.toDF("doc_id", "text"), "doc_id", "text", chunkSize, overlap)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+", -1).toSeq
        val cs = chunks(id)
        // chunk k starts at k*stride and carries min(chunkSize, rest) tokens
        cs.foreach { case (_, k, n, body) =>
          val expect = toks.slice((k * stride).toInt, (k * stride).toInt + chunkSize)
          assert(body == expect.mkString(" ") && n == expect.length,
            s"round $round doc $id chunk $k mismatch")
        }
        // coverage: the last chunk reaches the final token
        val (_, lastK, lastN, _) = cs.last
        assert(lastK * stride + lastN == toks.length,
          s"round $round doc $id: chunks end at ${lastK * stride + lastN} of ${toks.length}")
        // no chunk is a pure suffix rerun: every non-first chunk adds tokens
        assert(cs.length == 1 + math.max(0,
          math.ceil((toks.length - chunkSize).max(0).toDouble / stride).toInt))
      }
    }
  }

  test("packSequences: partition of the corpus with budget-aligned pack ids") {
    val rnd = new Random(11)
    for (round <- 1 to 4) {
      val budget = rnd.nextInt(40) + 10
      val docs = randomCorpus(rnd, 50)
      val packed = TextAnalysis
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text", budget, shards = 3)
        .as[(Long, Long, Long, Long)].collect()
      assert(packed.map(_._1).distinct.length == 50, s"round $round lost docs")
      packed.groupBy(_._2).foreach { case (shard, rows) =>
        var cum = 0L
        rows.sortBy(_._1).foreach { case (doc, _, n, pack) =>
          assert(pack == cum / budget,
            s"round $round shard $shard doc $doc: pack $pack at offset $cum")
          cum += n
        }
      }
    }
  }

  test("repetitionSignals: all fractions stay in [0, 1]") {
    val rnd = new Random(13)
    val docs = randomCorpus(rnd, 60)
    val got = TextAnalysis
      .repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 60)
    got.foreach { case (id, n, dw, dg, tw) =>
      assert(n >= 1 && dw >= 0 && dw <= 1 && dg >= 0 && dg <= 1 &&
        tw > 0 && tw <= 1, s"doc $id out-of-range signals ($dw, $dg, $tw)")
    }
  }
}
