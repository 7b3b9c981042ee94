package graft

/** Regression gate over a [[SoakBench]] 10× sweep — the CI discipline
  * that institutionalizes the one-shot soak artifacts: the round-11
  * full-surface sweep CAUGHT two floods (the uncapped lexical probe at
  * 200 s / 135 GB spill, the attribution hot-key grind at 390–450 s),
  * but only because a human read a 342-row log. This gate fails the
  * run mechanically when any query's 10× wall regresses past its
  * committed envelope, so the next q128-class flood is a red build,
  * not a paragraph.
  *
  * Contract, per row of the sweep (rows whose name is not a gated
  * query — TOTAL, skew_probe, rate_cap_ingest, hotkey_guard — are the
  * harness's own and judged by [[SoakBench]] itself):
  *
  *  - spec forms ([[ScaleRouting.siblings]] keys) and the raw-input
  *    rows of the ingest-contract family
  *    ([[ScaleRouting.ingestContract]]) are SKIPPED: their 10× grind
  *    is the documented reason their routed siblings / capped-leg rows
  *    exist, and those siblings ARE gated here (the
  *    `_on_rate_capped_ingest` rows carry their own baseline entries);
  *  - a non-ok row (exception, or a timeout outside the skip set)
  *    is a violation outright;
  *  - a query in the committed baseline must finish within
  *    max([[headroom]] × baseline, [[attentionFloorSec]]) — the floor
  *    keeps sub-30 s noise (single-rep replays measure ±30%, in-run
  *    contention reaches 2×) from paging anyone, while a real flood
  *    (two orders of magnitude, the only kind worth a red build)
  *    cannot hide above it;
  *  - a query NOT in the baseline (new this round) must finish under
  *    [[newQueryFloorSec]] and is reported as a note either way —
  *    the author measures it, documents its scaling class, and adds
  *    the baseline row in the same change.
  *
  * The baseline (`tools/soak_baseline.tsv`: name, seconds, class note)
  * is committed evidence, not config — regenerate rows only from an
  * executed sweep, never by editing a number to green a build. */
object SoakGate {

  final case class SoakRow(q: String, sec: Double, ok: Boolean, timedOut: Boolean)

  /** Walls at or under this never violate a baseline bound: single-rep
    * 10× replays measure ±30% and in-run contention reaches 2× — a
    * 12 s query drifting to 25 s is noise; a flood is 100+ s. */
  val attentionFloorSec = 30.0

  /** Multiplier over the committed baseline wall above which (and
    * above the floor) a query fails the gate. */
  val headroom = 2.0

  /** A query with no baseline row yet must still finish under this —
    * today's slowest legitimate non-spec 10× wall is the
    * capture–recapture tier at ~131 s; a new 200 s query is either a
    * flood or needs a documented class entry before it ships. */
  val newQueryFloorSec = 150.0

  def skipped(q: String): Boolean =
    ScaleRouting.siblings.contains(q) ||
      ScaleRouting.ingestContract.contains(q) ||
      ScaleRouting.specAudits.contains(q)

  /** Pure evaluation: (violations, notes). Violations fail the build;
    * notes are maintenance signals (new queries to baseline, baseline
    * rows whose query left the sweep). */
  def evaluate(
      rows: Seq[SoakRow],
      baseline: Map[String, Double]): (Seq[String], Seq[String]) = {
    val vio = Seq.newBuilder[String]
    val notes = Seq.newBuilder[String]
    val gated = rows.filter(r => r.q.matches("^q\\d.*"))
    gated.foreach { r =>
      if (skipped(r.q)) ()
      else if (!r.ok)
        vio += s"${r.q}: ${if (r.timedOut) "TIMED OUT" else "FAILED"} in the sweep"
      else baseline.get(r.q) match {
        case Some(b) =>
          val bound = math.max(headroom * b, attentionFloorSec)
          if (r.sec > bound)
            vio += f"${r.q}: 10x wall ${r.sec}%.1f s exceeds ${bound}%.1f s " +
              f"(committed baseline $b%.1f s x $headroom%.1f, floor " +
              f"$attentionFloorSec%.0f s) - a flood or a regression; " +
              "diagnose before re-baselining"
        case None =>
          if (r.sec > newQueryFloorSec)
            vio += f"${r.q}: NEW query's 10x wall ${r.sec}%.1f s exceeds the " +
              f"$newQueryFloorSec%.0f s new-query floor - document its " +
              "scaling class and mitigation before adding a baseline row"
          else
            notes += f"${r.q}: new query (${r.sec}%.1f s) - add its baseline row"
      }
    }
    val seen = gated.map(_.q).toSet
    (baseline.keySet -- seen).toSeq.sorted.foreach { q =>
      notes += s"$q: baseline row has no sweep row (renamed or dropped?)"
    }
    (vio.result(), notes.result())
  }

  /** Minimal parse of the SoakBench row format ("[soak] " prefix
    * optional): needs q, sec, ok, timed_out; rows without q/sec (the
    * harness's own summary rows) are dropped. Returns (rows, malformed
    * lines): a line that starts like a row but fails to parse means the
    * sweep JVM died mid-write (OOM, external kill) — the gate must
    * report that as a violation, not crash with a parser stack trace
    * (which CI reads as infrastructure error, not a regression). */
  private[graft] def parseJsonl(
      lines: Iterator[String]): (Seq[SoakRow], Seq[String]) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val bad = Seq.newBuilder[String]
    val rows = lines.flatMap { raw =>
      val l = raw.trim.stripPrefix("[soak]").trim
      if (!l.startsWith("{")) None
      else scala.util.Try(om.readTree(l)).toOption match {
        case None =>
          bad += (if (l.length <= 120) l else l.take(117) + "...")
          None
        case Some(n) =>
          if (n.hasNonNull("q") && n.hasNonNull("sec"))
            Some(SoakRow(
              n.get("q").asText(),
              n.get("sec").asDouble(),
              // rows without ok (e.g. rate_cap_ingest) are harness rows;
              // default true keeps them out of the violation path
              if (n.hasNonNull("ok")) n.get("ok").asBoolean() else true,
              if (n.hasNonNull("timed_out")) n.get("timed_out").asBoolean()
              else false))
          else None
      }
    }.toSeq
    (rows, bad.result())
  }

  private[graft] def parseBaseline(lines: Iterator[String]): Map[String, Double] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split("\t")
        require(parts.length >= 2, s"baseline row needs name<TAB>seconds: $l")
        parts(0) -> parts(1).toDouble
      }.toMap

  /** Usage: SoakGate <sweep.jsonl> [<sweep2.jsonl> ...] [baseline.tsv]
    * — every .jsonl arg is a sweep leg (the full sweep plus the
    * rate-cap leg), the .tsv arg (default tools/soak_baseline.tsv) the
    * committed baseline. */
  def main(args: Array[String]): Unit = {
    val (tsv, jsonl) = args.partition(_.endsWith(".tsv"))
    val soakPaths = if (jsonl.nonEmpty) jsonl.toSeq else Seq("soak_r11.jsonl")
    val basePath = tsv.headOption.getOrElse("tools/soak_baseline.tsv")
    val parsed = soakPaths.map(p =>
      p -> parseJsonl(scala.io.Source.fromFile(p).getLines()))
    val rows = parsed.flatMap(_._2._1)
    val malformed = parsed.flatMap { case (p, (_, bad)) =>
      bad.map(l => s"$p: malformed sweep row (JVM died mid-write?): $l")
    }
    val baseline = parseBaseline(
      scala.io.Source.fromFile(basePath).getLines())
    val (vioEval, notes) = evaluate(rows, baseline)
    val vio = malformed ++ vioEval
    notes.foreach(n => println(s"[soakgate] NOTE $n"))
    vio.foreach(v => println(s"[soakgate] VIOLATION $v"))
    println(s"[soakgate] ${rows.count(_.q.matches("^q\\d.*"))} query rows, " +
      s"${baseline.size} baseline rows, ${vio.size} violations, " +
      s"${notes.size} notes")
    if (vio.nonEmpty) sys.exit(1)
  }
}
