package graft.oracle

import graft.functions.Portable
import graft.ext.TextAnalysis

/** DuckDB mirrors for the extension operators (dedup / similarity / text
  * analysis). The MinHash/SimHash SQL is generated from the SAME
  * constants ([[Portable.aCoef]]/[[Portable.bCoef]], perm/bit counts) the
  * Spark operators use, so the two sides cannot drift.
  */
object ExtOracleSql {

  private val P = Portable.P31
  val NumPerms = 16
  val Bands = 4
  val RowsPerBand = 4
  val SimhashBits = 32

  private def h60(e: String): String = Portable.h60Sql(e)

  /** doc_id + token-list CTEs over documents. */
  private val toksCte =
    s"""toks AS (
       |  SELECT doc_id, ${Portable.tokensSql("text")} AS t FROM documents)""".stripMargin

  private val shinglesExpr = Portable.shinglesSql("t")

  private def minsSelect: String =
    (0 until NumPerms).map { i =>
      s"min((h * ${Portable.aCoef(i)} + ${Portable.bCoef(i)}) % $P) AS sig_$i"
    }.mkString(",\n         ")

  private def sigCte: String =
    s"""sh AS (
       |  SELECT doc_id, unnest($shinglesExpr) AS s FROM toks),
       |hh AS (
       |  SELECT doc_id, ${h60("s")} % $P AS h FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $minsSelect
       |  FROM hh GROUP BY 1)""".stripMargin

  private def bandsCte: String = {
    val bands = (0 until Bands).map { j =>
      val folded = Portable.bandKeySql(
        (0 until RowsPerBand).map(r => s"sig_${j * RowsPerBand + r}"))
      s"SELECT doc_id, $j AS band, $folded AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""bands AS (
       |  $bands),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Mirrors [[graft.ext.Dedup.lshCalibrationCurve]]: all-pairs exact
    * Jaccard over the id-ordered `capDocs` sample, integer bucket
    * assignment, LEFT-joined LSH candidate hits, and the same
    * driver-computed analytic constants inlined verbatim. The capped
    * `cap`/`toks` base feeds the shared sig/bands CTEs. */
  def lshCalibrationCurve(buckets: Int, capDocs: Int): String = {
    val analyticCases = (0 until buckets).map { k =>
      s"WHEN $k THEN ${graft.ext.Dedup.lshAnalyticDetect(k, buckets, Bands, RowsPerBand)}"
    }.mkString(" ")
    s"""WITH cap AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |  ORDER BY doc_id LIMIT $capDocs),
       |toks AS (
       |  SELECT doc_id, ${Portable.tokensSql("text")} AS t FROM cap),
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |allp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM cap a JOIN cap b ON a.doc_id < b.doc_id),
       |lex AS (
       |  SELECT p.id_a, p.id_b,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |         CAST(len(a.sh) + len(b.sh)
       |           - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni
       |  FROM allp p
       |  JOIN sharr a ON p.id_a = a.doc_id
       |  JOIN sharr b ON p.id_b = b.doc_id),
       |lbi AS (
       |  SELECT LEAST((inter * $buckets) // uni, ${buckets - 1}) AS bin,
       |         id_a, id_b
       |  FROM lex),
       |lhit AS (SELECT id_a, id_b, 1 AS h FROM pairs),
       |lagg AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(sum(coalesce(h, 0)) AS BIGINT) AS n_detected
       |  FROM lbi LEFT JOIN lhit USING (id_a, id_b) GROUP BY 1),
       |lsp AS (SELECT unnest(range($buckets)) AS bin)
       |SELECT lsp.bin,
       |       round(CAST(lsp.bin AS DOUBLE) / $buckets, 6) AS j_lo,
       |       coalesce(n_pairs, 0) AS n_pairs,
       |       coalesce(n_detected, 0) AS n_detected,
       |       CASE WHEN coalesce(n_pairs, 0) > 0 THEN
       |         (((n_detected * 1000000 * 2) + n_pairs) // (n_pairs * 2))
       |           / 1e6 END AS detect_rate,
       |       CASE lsp.bin $analyticCases END AS analytic_detect
       |FROM lsp LEFT JOIN lagg ON lsp.bin = lagg.bin
       |ORDER BY 1""".stripMargin
  }

  /** Oracle for [[graft.ext.Dedup.prefixJaccardJoin]] — deliberately
    * the BRUTE-FORCE all-pairs exact join over the same id-ordered
    * capped sample (no prefix filter), so a hash match proves the
    * filter's completeness: every J ≥ τ pair survives it. The
    * both-empty-set degenerate pair (|∪| = 0) is excluded on both
    * engines. */
  def prefixJaccardJoin(tauNum: Int, tauDen: Int, capDocs: Int): String =
    s"""WITH ppc AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       |  ORDER BY doc_id LIMIT $capDocs),
       |ppt AS (SELECT doc_id, ${Portable.tokensSql("text")} AS t FROM ppc),
       |pps AS (SELECT doc_id, list_distinct($shinglesExpr) AS sh FROM ppt),
       |ppa AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |        FROM ppc a JOIN ppc b ON a.doc_id < b.doc_id),
       |ppv AS (SELECT p.id_a, p.id_b,
       |               CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT)
       |                 AS inter,
       |               CAST(len(x.sh) AS BIGINT) AS na,
       |               CAST(len(y.sh) AS BIGINT) AS nb
       |        FROM ppa p JOIN pps x ON p.id_a = x.doc_id
       |                   JOIN pps y ON p.id_b = y.doc_id)
       |SELECT id_a AS doc_a, id_b AS doc_b, na AS n_a, nb AS n_b,
       |       inter AS n_common,
       |       (((inter * 1000000 * 2) + (na + nb - inter))
       |        // ((na + nb - inter) * 2)) / 1e6 AS jaccard
       |FROM ppv
       |WHERE na + nb > inter
       |  AND inter * $tauDen >= (na + nb - inter) * $tauNum
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirrors [[graft.ext.Dedup.dedupCaptureRecapture]]: the shared
    * LSH `pairs` CTE and the q17 simhash chain, both verified with
    * the same exact-Jaccard ≥ τ contract; Chapman's estimator over
    * the three exact counts. */
  def dedupCaptureRecapture(minJaccard: Double): String = {
    val sums = (0 until SimhashBits)
      .map(b => s"sum(((h >> $b) & 1) * 2 - 1) AS s_$b")
      .mkString(",\n         ")
    val packed = (0 until SimhashBits)
      .map(b => s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    val jac = (x: String, y: String) =>
      s"""CAST(len(list_intersect($x.sh, $y.sh)) AS DOUBLE)
         |  / (len($x.sh) + len($y.sh) - len(list_intersect($x.sh, $y.sh)))"""
        .stripMargin
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |cra AS (
       |  SELECT p.id_a, p.id_b FROM pairs p
       |  JOIN sharr a ON p.id_a = a.doc_id
       |  JOIN sharr b ON p.id_b = b.doc_id
       |  WHERE ${jac("a", "b")} >= $minJaccard),
       |crt AS (
       |  SELECT doc_id, unnest(list_distinct(${Portable.tokensSql("text")}))
       |    AS t
       |  FROM documents),
       |crh AS (SELECT doc_id, ${h60("t")} AS h FROM crt),
       |crs AS (SELECT doc_id,
       |         $sums
       |  FROM crh GROUP BY 1),
       |crsh AS (SELECT doc_id, $packed AS simhash FROM crs),
       |crb AS (SELECT doc_id, 0 AS b, simhash >> 16 AS k FROM crsh
       |        UNION ALL
       |        SELECT doc_id, 1 AS b, simhash & 65535 AS k FROM crsh),
       |crc AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |        FROM crb x JOIN crb y
       |          ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id),
       |crbv AS (
       |  SELECT c.id_a, c.id_b FROM crc c
       |  JOIN sharr a ON c.id_a = a.doc_id
       |  JOIN sharr b ON c.id_b = b.doc_id
       |  WHERE ${jac("a", "b")} >= $minJaccard),
       |crn AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM cra) AS n1,
       |         (SELECT CAST(count(*) AS BIGINT) FROM crbv) AS n2,
       |         (SELECT CAST(count(*) AS BIGINT)
       |          FROM cra x JOIN crbv y
       |            ON x.id_a = y.id_a AND x.id_b = y.id_b) AS m),
       |crch AS (
       |  SELECT *,
       |         ((CAST(n1 + 1 AS HUGEINT) * (n2 + 1) * 1000000 * 2 + (m + 1))
       |          // ((m + 1) * 2)) - 1000000 AS nhat_u,
       |         CAST(round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m)
       |           * (n2 - m)
       |           / (CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2)) * 1e6)
       |           AS BIGINT) AS varq
       |  FROM crn)
       |SELECT n1 AS n_lsh, n2 AS n_simhash, m AS m_overlap,
       |       nhat_u / 1e6 AS n_hat,
       |       CAST(round(sqrt(varq / 1e6) * 1e6) AS BIGINT) / 1e6 AS se,
       |       CASE WHEN nhat_u > 0 THEN
       |         CAST(round(n1 / (nhat_u / 1e6) * 1e6) AS BIGINT) / 1e6
       |       END AS recall_lsh,
       |       CASE WHEN nhat_u > 0 THEN
       |         CAST(round(n2 / (nhat_u / 1e6) * 1e6) AS BIGINT) / 1e6
       |       END AS recall_simhash
       |FROM crch""".stripMargin
  }

  /** Mirrors [[graft.ext.Dedup.fellegiSunter]] wired over `part`
    * (block = brand; fields name/type/container/size): the same
    * driver-computed integer weights for the fuzzy name field, the
    * same Σn²∕N² exact u for equality fields, the q168 JW agreement
    * predicate, 1e-9-quantized ln terms, pattern-grain rollup. */
  def fellegiSunterParts(m: Double, uName: Double, jwMin: Double): String = {
    val waName = math.round(math.log(m / uName) * 1e9)
    val wdName = math.round(math.log((1 - m) / (1 - uName)) * 1e9)
    def uCte(tag: String, c: String) =
      s"""fsu_$tag AS (
         |  SELECT CAST(sum(CAST(nv AS HUGEINT) * nv) AS HUGEINT) AS st,
         |         CAST(sum(nv) AS BIGINT) AS nn
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS nv FROM part
         |        GROUP BY $c))""".stripMargin
    // 1−m inlined as the Scala-computed double (a `1.0 - 0.9` literal
    // would fold in DECIMAL here — exact 0.1 — but DOUBLE in Spark)
    val oneMinusM = 1.0 - m
    def w(tag: String, flag: String) =
      s"""CASE WHEN $flag THEN
         |  CAST(round(ln($m / (CAST($tag.st AS DOUBLE) / $tag.nn / $tag.nn))
         |    * 1e9) AS BIGINT)
         |ELSE
         |  CAST(round(ln($oneMinusM
         |      / (1.0 - CAST($tag.st AS DOUBLE) / $tag.nn / $tag.nn))
         |    * 1e9) AS BIGINT) END""".stripMargin
    s"""WITH fsb AS (
       |  SELECT p_brand AS block, p_partkey AS id, p_name AS name,
       |         p_type, p_size FROM part),
       |${uCte("t", "p_type")},
       |${uCte("s", "p_size")},
       |fsp AS (
       |  SELECT round(jaro_winkler_similarity(a.name, b.name), 6) >= $jwMin
       |           AS agree_name,
       |         a.p_type = b.p_type AS agree_p_type,
       |         a.p_size = b.p_size AS agree_p_size
       |  FROM fsb a JOIN fsb b ON a.block = b.block AND a.id < b.id),
       |fsg AS (
       |  SELECT agree_name, agree_p_type, agree_p_size,
       |         CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM fsp GROUP BY 1, 2, 3),
       |fsw AS (
       |  SELECT g.*,
       |         CASE WHEN agree_name THEN $waName ELSE $wdName END
       |         + ${w("t", "agree_p_type")}
       |         + ${w("s", "agree_p_size")} AS su
       |  FROM fsg g CROSS JOIN fsu_t t CROSS JOIN fsu_s s)
       |SELECT agree_name, agree_p_type, agree_p_size,
       |       n_pairs, round(su / 1e9, 6) AS score
       |FROM fsw
       |ORDER BY agree_name DESC, agree_p_type DESC, agree_p_size DESC"""
      .stripMargin
  }

  /** Mirrors [[graft.ext.Dedup.dedupAgainst]] with the batch flagged as
    * `doc_id ≡ 0 (mod modEvery)`: cross-side band candidates derived
    * from the symmetric `pairs` CTE by orientation, exact-Jaccard
    * verify, per-batch best match (jaccard desc, corpus id asc). */
  def dedupAgainst(modEvery: Int, minJaccard: Double): String =
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |cand AS (
       |  SELECT CASE WHEN id_a % $modEvery = 0 THEN id_b ELSE id_a END AS corpus_id,
       |         CASE WHEN id_a % $modEvery = 0 THEN id_a ELSE id_b END AS batch_id
       |  FROM pairs
       |  WHERE (id_a % $modEvery = 0) <> (id_b % $modEvery = 0)),
       |ver AS (
       |  SELECT c.batch_id, c.corpus_id,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |           AS jaccard
       |  FROM cand c
       |  JOIN sharr a ON c.corpus_id = a.doc_id
       |  JOIN sharr b ON c.batch_id = b.doc_id),
       |hitsv AS (SELECT * FROM ver WHERE jaccard >= $minJaccard),
       |rk AS (
       |  SELECT batch_id, corpus_id, jaccard,
       |         count(*) OVER (PARTITION BY batch_id) AS n_matches,
       |         row_number() OVER (PARTITION BY batch_id
       |           ORDER BY jaccard DESC, corpus_id) AS rn
       |  FROM hitsv)
       |SELECT batch_id, n_matches, corpus_id AS best_match_id,
       |       jaccard AS best_jaccard
       |FROM rk WHERE rn = 1 ORDER BY batch_id""".stripMargin

  def minhashNearDups(minEst: Double): String = {
    val agree = (0 until NumPerms)
      .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |est AS (
       |  SELECT id_a, id_b,
       |         CAST($agree AS DOUBLE) / $NumPerms AS est_jaccard
       |  FROM pairs
       |  JOIN sig sa ON pairs.id_a = sa.doc_id
       |  JOIN sig sb ON pairs.id_b = sb.doc_id)
       |SELECT id_a, id_b, est_jaccard FROM est
       |WHERE est_jaccard >= $minEst ORDER BY id_a, id_b""".stripMargin
  }

  /** Mirrors [[graft.ext.Sampling.splitContamination]] — the
    * [[minhashNearDups]] pair chain labeled with [[hashSplit]]'s
    * assignment and rolled up per unordered split pair. */
  def splitContamination(
      trainPct: Int, valPct: Int, salt: String, minEst: Double): String = {
    val agree = (0 until NumPerms)
      .map(i => s"CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bucket = graft.ext.Sampling.hashBucketSql("doc_id", salt)
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |est AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sig sa ON pairs.id_a = sa.doc_id
       |  JOIN sig sb ON pairs.id_b = sb.doc_id
       |  WHERE CAST($agree AS DOUBLE) / $NumPerms >= $minEst),
       |sp AS (
       |  SELECT doc_id,
       |         CASE WHEN $bucket < $trainPct THEN 'train'
       |              WHEN $bucket < ${trainPct + valPct} THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |lab AS (
       |  SELECT least(sa.split, sb.split) AS split_lo,
       |         greatest(sa.split, sb.split) AS split_hi
       |  FROM est e
       |  JOIN sp sa ON e.id_a = sa.doc_id
       |  JOIN sp sb ON e.id_b = sb.doc_id)
       |SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
       |       split_lo != split_hi AS is_leak
       |FROM lab GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin
  }

  def jaccardVerify: String =
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks)
       |SELECT id_a, id_b,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM pairs
       |JOIN sharr a ON pairs.id_a = a.doc_id
       |JOIN sharr b ON pairs.id_b = b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Mirrors [[graft.ext.Dedup.dupRateBySource]]: the [[jaccardVerify]]
    * pairs at `minJaccard`, unpivoted symmetrically and rolled up to
    * source grain with the cross-source partner flag. */
  def dupRateBySource(minJaccard: Double): String =
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |drv AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sharr a ON pairs.id_a = a.doc_id
       |  JOIN sharr b ON pairs.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= $minJaccard),
       |drt AS (
       |  SELECT id_a AS doc_id, id_b AS partner FROM drv
       |  UNION ALL
       |  SELECT id_b, id_a FROM drv),
       |drs AS (SELECT doc_id, source AS src FROM documents),
       |drd AS (
       |  SELECT t.doc_id, s.src,
       |         CAST(sum(CASE WHEN p.src <> s.src THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_cross
       |  FROM drt t
       |  JOIN drs s ON t.doc_id = s.doc_id
       |  JOIN drs p ON t.partner = p.doc_id
       |  GROUP BY 1, 2),
       |dra AS (
       |  SELECT src AS source, count(*) AS n_dup_docs,
       |         CAST(sum(CASE WHEN n_cross > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_cross_source_docs
       |  FROM drd GROUP BY 1),
       |drn AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
       |SELECT t.source, t.n_docs,
       |       COALESCE(a.n_dup_docs, 0) AS n_dup_docs,
       |       round(CAST(COALESCE(a.n_dup_docs, 0) AS DOUBLE) / t.n_docs, 6)
       |         AS dup_share,
       |       COALESCE(a.n_cross_source_docs, 0) AS n_cross_source_docs
       |FROM drn t LEFT JOIN dra a USING (source)
       |ORDER BY source""".stripMargin

  /** Mirrors [[graft.ext.Dedup.containmentPairs]]: the same candidate
    * pairs as [[jaccardVerify]] scored with directional containment. */
  def containmentVerify: String =
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks)
       |SELECT id_a, id_b,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
       |         AS containment_a,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh)
       |         AS containment_b
       |FROM pairs
       |JOIN sharr a ON pairs.id_a = a.doc_id
       |JOIN sharr b ON pairs.id_b = b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.boilerplateShare]]. `count(*)`
    * and `count(hit)` are BIGINT on both engines (no HUGEINT window
    * sums here), and the share is a bare integer division — dtype- and
    * bit-exact. */
  def boilerplateShare(n: Int, minDf: Long): String =
    s"""WITH $toksCte,
       |shn AS (
       |  SELECT doc_id, unnest(${Portable.shinglesSql("t", n)}) AS s FROM toks),
       |freq AS (
       |  SELECT s, 1 AS hit FROM shn GROUP BY s HAVING count(*) >= $minDf)
       |SELECT doc_id, count(*) AS n_ngrams, count(f.hit) AS n_boiler,
       |       count(f.hit) / count(*) AS boiler_share
       |FROM shn LEFT JOIN freq f USING (s)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.bigramMergeStats]]. Counts are
    * `count(*)`/`count(DISTINCT …)` — BIGINT on both engines. */
  def bigramMergeStats(topK: Int): String =
    s"""WITH $toksCte,
       |prs AS (
       |  SELECT doc_id, unnest([t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))])
       |    AS pair
       |  FROM toks),
       |agg AS (
       |  SELECT pair, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
       |  FROM prs GROUP BY 1)
       |SELECT row_number() OVER (ORDER BY n_occurrences DESC, pair) AS merge_rank,
       |       pair, n_occurrences, n_docs
       |FROM agg
       |QUALIFY merge_rank <= $topK
       |ORDER BY merge_rank""".stripMargin

  /** Mirrors [[graft.ext.Profiling.groupQuantilesDisc]] over
    * documents(source, n_chars). Discrete quantiles take an existing
    * BIGINT value — no interpolation, no float drift. */
  def lengthQuantiles(ps: Seq[Double]): String = {
    val cols = ps.map { p =>
      val lit = BigDecimal(p).underlying.toPlainString
      s"max(CASE WHEN rn = greatest(1, CAST(ceil($lit * cnt) AS BIGINT)) " +
        s"THEN n_chars END) AS ${graft.ext.Profiling.quantileLabel(p)}"
    }.mkString(",\n       |       ").stripMargin
    s"""WITH r AS (
       |  SELECT source, n_chars,
       |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
       |         count(*) OVER (PARTITION BY source) AS cnt
       |  FROM documents)
       |SELECT source,
       |       $cols,
       |       max(cnt) AS n_rows
       |FROM r GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.postings]]. */
  def postings(maxPostings: Int): String =
    s"""WITH $toksCte,
       |tok AS (
       |  SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks)
       |SELECT term, count(*) AS doc_freq,
       |       array_to_string(list_sort(list(doc_id))[1:$maxPostings], ',')
       |         AS posting_sample
       |FROM tok GROUP BY 1 ORDER BY term""".stripMargin

  /** Mirrors [[graft.ext.Dedup.sourceOverlapMatrix]]. */
  def sourceOverlap(n: Int, maxDf: Long): String =
    s"""WITH dt AS (
       |  SELECT doc_id, source, ${Portable.tokensSql("text")} AS t FROM documents),
       |shn AS (
       |  SELECT doc_id, source, unnest(${Portable.shinglesSql("t", n)}) AS s FROM dt),
       |keep AS (
       |  SELECT s FROM shn GROUP BY s HAVING count(*) <= $maxDf),
       |ss AS (
       |  SELECT DISTINCT source, s FROM shn JOIN keep USING (s))
       |SELECT a.source AS source_a, b.source AS source_b,
       |       count(*) AS n_shared_ngrams
       |FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Character-n-gram Jaccard near-dups (mirrors
    * [[graft.ext.Dedup.ngramJaccardPairs]]): char-gram MinHash+LSH
    * candidates verified with exact char-gram Jaccard. */
  def ngramJaccard(n: Int): String =
    s"""WITH gr AS (
       |  SELECT doc_id, ${Portable.charShinglesSql("lower(text)", n)} AS sh
       |  FROM documents),
       |hh AS (
       |  SELECT doc_id, ${h60("s")} % $P AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM gr)),
       |sig AS (
       |  SELECT doc_id,
       |         $minsSelect
       |  FROM hh GROUP BY 1),
       |$bandsCte
       |SELECT id_a, id_b,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM pairs
       |JOIN gr a ON pairs.id_a = a.doc_id
       |JOIN gr b ON pairs.id_b = b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  def simhash: String = {
    val sums = (0 until SimhashBits)
      .map(b => s"sum(((h >> $b) & 1) * 2 - 1) AS s_$b")
      .mkString(",\n         ")
    val packed = (0 until SimhashBits)
      .map(b => s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(${Portable.tokensSql("text")})) AS t
       |  FROM documents),
       |th AS (SELECT doc_id, ${h60("t")} AS h FROM tok),
       |sums AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM th GROUP BY 1)
       |SELECT doc_id, $packed AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  def exactRowDups: String =
    s"""SELECT l_orderkey, l_linenumber, count(*) AS dup_count
       |FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val vecsCte =
    "v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"

  /** The shared product-quantization CTE chain (mirrors
    * [[graft.ext.Similarity.pqCodebook]]/`pqEncode` at the engine
    * defaults): subvector split, seed codebook, one assign/update round,
    * final assignment. Ends with `pqc1(blk, code, cemb)` (the final
    * codebook) and `pqa2(vec_id, blk, semb, code, dist)`. */
  def pqChainCtes(blocks: Int, seedEvery: Int): String =
    s"""pqv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |        FROM embeddings),
       |pqsub AS (SELECT vec_id, b.blk,
       |                 emb[(b.blk * (len(emb) // $blocks) + 1)
       |                     :((b.blk + 1) * (len(emb) // $blocks))] AS semb
       |          FROM pqv CROSS JOIN
       |            (SELECT unnest(range($blocks)) AS blk) b),
       |pqc0 AS (SELECT blk, vec_id AS code, semb AS cemb
       |         FROM pqsub WHERE vec_id % $seedEvery = 0),
       |pqa1 AS (SELECT vec_id, blk, semb, code FROM (
       |           SELECT s.vec_id, s.blk, s.semb, c.code,
       |                  row_number() OVER (PARTITION BY s.vec_id, s.blk
       |                    ORDER BY round(list_distance(s.semb, c.cemb), 6),
       |                             c.code) AS rn
       |           FROM pqsub s JOIN pqc0 c ON s.blk = c.blk)
       |         WHERE rn = 1),
       |pqc1 AS (SELECT blk, code, list(c ORDER BY pos) AS cemb FROM (
       |           SELECT blk, code, pos,
       |                  round((sum(round(x * 1000000)) / count(*))
       |                        / 1000000.0, 6) AS c
       |           FROM (SELECT blk, code,
       |                        unnest(generate_series(1, len(semb))) AS pos,
       |                        unnest(semb) AS x
       |                 FROM pqa1)
       |           GROUP BY 1, 2, 3) GROUP BY 1, 2),
       |pqa2 AS (SELECT vec_id, blk, semb, code, dist FROM (
       |           SELECT s.vec_id, s.blk, s.semb, c.code,
       |                  round(list_distance(s.semb, c.cemb), 6) AS dist,
       |                  row_number() OVER (PARTITION BY s.vec_id, s.blk
       |                    ORDER BY round(list_distance(s.semb, c.cemb), 6),
       |                             c.code) AS rn
       |           FROM pqsub s JOIN pqc1 c ON s.blk = c.blk)
       |         WHERE rn = 1)""".stripMargin

  /** Mirrors [[graft.ext.Similarity.pqEncode]]. */
  def pqEncode(blocks: Int, seedEvery: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)}
       |SELECT vec_id, blk, code, dist FROM pqa2
       |ORDER BY vec_id, blk""".stripMargin

  /** The ADC scoring CTEs on top of [[pqChainCtes]]: per-(query, block,
    * codeword) squared distances quantized to 1e-9-unit longs before
    * the per-pair order-free sum. Ends with `pqs(query_id, vec_id, sn)`. */
  def pqAdcCtes(queryModEvery: Int): String =
    s"""pqq AS (SELECT vec_id AS query_id, blk, semb FROM pqsub
       |        WHERE vec_id % $queryModEvery = 0),
       |pqt AS (SELECT q.query_id, c.blk, c.code,
       |               CAST(round(
       |                 round(list_distance(q.semb, c.cemb), 6)
       |                 * round(list_distance(q.semb, c.cemb), 6)
       |                 * 1e9) AS BIGINT) AS pn
       |        FROM pqq q JOIN pqc1 c ON q.blk = c.blk),
       |pqs AS (SELECT t.query_id, a.vec_id,
       |               CAST(sum(t.pn) AS BIGINT) AS sn
       |        FROM pqa2 a JOIN pqt t
       |          ON a.blk = t.blk AND a.code = t.code
       |        WHERE a.vec_id <> t.query_id
       |        GROUP BY 1, 2)""".stripMargin

  /** Mirrors [[graft.ext.Similarity.pqAdcTopK]]. */
  def pqAdcTopK(queryModEvery: Int, k: Int, blocks: Int, seedEvery: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)},
       |${pqAdcCtes(queryModEvery)},
       |pqr AS (SELECT query_id, vec_id, sn,
       |               row_number() OVER (PARTITION BY query_id
       |                 ORDER BY sn, vec_id) AS rank
       |        FROM pqs)
       |SELECT query_id, vec_id,
       |       (sn + 500) // 1000 / 1e6 AS adc_dist, rank
       |FROM pqr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Similarity.pqAdcRecall]] — exact Euclidean
    * top-k on the query subset intersected with the ADC top-k. */
  def pqAdcRecall(queryModEvery: Int, k: Int, blocks: Int, seedEvery: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)},
       |${pqAdcCtes(queryModEvery)},
       |adk AS (SELECT query_id, vec_id FROM (
       |          SELECT query_id, vec_id,
       |                 row_number() OVER (PARTITION BY query_id
       |                   ORDER BY sn, vec_id) AS rank
       |          FROM pqs) WHERE rank <= $k),
       |exq AS (SELECT vec_id AS query_id, emb AS qemb FROM pqv
       |        WHERE vec_id % $queryModEvery = 0),
       |exd AS (SELECT q.query_id, p.vec_id,
       |               round(list_distance(p.emb, q.qemb), 6) AS dist
       |        FROM pqv p CROSS JOIN exq q
       |        WHERE p.vec_id <> q.query_id),
       |exk AS (SELECT query_id, vec_id FROM (
       |          SELECT query_id, vec_id,
       |                 row_number() OVER (PARTITION BY query_id
       |                   ORDER BY dist, vec_id) AS rank
       |          FROM exd) WHERE rank <= $k),
       |ph AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
       |       FROM exk e JOIN adk a
       |         ON e.query_id = a.query_id AND e.vec_id = a.vec_id
       |       GROUP BY 1)
       |SELECT x.query_id,
       |       COALESCE(ph.hits, 0) AS hits,
       |       CAST(COALESCE(ph.hits, 0) AS DOUBLE) / $k AS recall_at_k
       |FROM (SELECT DISTINCT query_id FROM exk) x
       |LEFT JOIN ph ON x.query_id = ph.query_id
       |ORDER BY x.query_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.ivfPqTopK]] — L2 cell assignment
    * (rounded-distance argmin, centroid-asc ties), nProbe query cells,
    * ADC scoring restricted to probed cells. */
  def ivfPqTopK(
      queryModEvery: Int, k: Int, blocks: Int, seedEvery: Int,
      centroidEvery: Int, nProbe: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)},
       |${pqAdcCtes(queryModEvery)},
       |ipc AS (SELECT vec_id AS centroid_id, emb AS cemb FROM pqv
       |        WHERE vec_id % $centroidEvery = 0),
       |ipa AS (SELECT vec_id, centroid_id, rn FROM (
       |          SELECT p.vec_id, c.centroid_id,
       |                 row_number() OVER (PARTITION BY p.vec_id
       |                   ORDER BY round(list_distance(p.emb, c.cemb), 6),
       |                            c.centroid_id) AS rn
       |          FROM pqv p CROSS JOIN ipc c)
       |        WHERE rn <= $nProbe),
       |ipcell AS (SELECT vec_id, centroid_id AS cell FROM ipa WHERE rn = 1),
       |ipq AS (SELECT vec_id AS query_id, centroid_id AS cell FROM ipa
       |        WHERE vec_id % $queryModEvery = 0),
       |ips AS (SELECT t.query_id, a.vec_id, CAST(sum(t.pn) AS BIGINT) AS sn
       |        FROM pqa2 a
       |        JOIN ipcell ic ON ic.vec_id = a.vec_id
       |        JOIN ipq pq ON pq.cell = ic.cell
       |        JOIN pqt t ON t.query_id = pq.query_id
       |                  AND t.blk = a.blk AND t.code = a.code
       |        WHERE a.vec_id <> pq.query_id
       |        GROUP BY 1, 2),
       |ipr AS (SELECT query_id, vec_id, sn,
       |               row_number() OVER (PARTITION BY query_id
       |                 ORDER BY sn, vec_id) AS rank
       |        FROM ips)
       |SELECT query_id, vec_id,
       |       (sn + 500) // 1000 / 1e6 AS adc_dist, rank
       |FROM ipr WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Similarity.pqCodeDedupPairs]]: full-code-word
    * collision pairs verified with the exact 6dp distance. */
  def pqCodeDedup(maxDist: Double, blocks: Int, seedEvery: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)},
       |cdk AS (SELECT vec_id, list(code ORDER BY blk) AS ck
       |        FROM pqa2 GROUP BY 1),
       |cdp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |        FROM cdk a JOIN cdk b
       |          ON a.ck = b.ck AND a.vec_id < b.vec_id)
       |SELECT p.id_a, p.id_b,
       |       round(list_distance(va.emb, vb.emb), 6) AS dist,
       |       round(list_distance(va.emb, vb.emb), 6) <= $maxDist AS is_near
       |FROM cdp p
       |JOIN pqv va ON p.id_a = va.vec_id
       |JOIN pqv vb ON p.id_b = vb.vec_id
       |ORDER BY id_a, id_b""".stripMargin

  def embeddingNearDups(threshold: Double): String =
    s"""WITH $vecsCte
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  def topKNeighbors(k: Int): String =
    s"""WITH $vecsCte,
       |cj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM v a JOIN v b ON a.vec_id != b.vec_id),
       |rk AS (
       |  SELECT vec_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Shared exact-top-k CTE chain (the q20 contract: 6dp-rounded
    * cosine, neighbor-id tie-break), ending in `exk(vec_id,
    * neighbor_id)`. Assumes `v` from [[vecsCte]] is already in scope. */
  private def exactTopKCtes(k: Int): String =
    s"""excj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM v a JOIN v b ON a.vec_id != b.vec_id),
       |exrk AS (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM excj),
       |exk AS (SELECT vec_id, neighbor_id FROM exrk WHERE rank <= $k)""".stripMargin

  /** Mirrors [[graft.ext.Similarity.hubnessAudit]] — the q20 exact
    * top-k chain, k-occurrence counts over a left join back to the
    * full vector set, exact moment sums, one quantized skewness
    * chain. */
  def hubnessAudit(k: Int): String =
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)},
       |hoc AS (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS c
       |        FROM exk GROUP BY 1),
       |hall AS (SELECT v.vec_id, coalesce(o.c, 0) AS c
       |         FROM v LEFT JOIN hoc o ON v.vec_id = o.neighbor_id),
       |hagg AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                CAST(sum(c) AS BIGINT) AS s1,
       |                CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
       |                CAST(sum(CAST(c AS HUGEINT) * c * c) AS HUGEINT)
       |                  AS s3,
       |                CAST(max(c) AS BIGINT) AS max_k_occ,
       |                CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n_antihubs,
       |                CAST(sum(CASE WHEN c >= ${2 * k} THEN 1 ELSE 0 END)
       |                  AS BIGINT) AS n_hubs
       |         FROM hall),
       |hmu AS (SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM hagg),
       |hm AS (SELECT *,
       |         CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
       |         CAST(s3 AS DOUBLE) / n - 3.0 * mu * (CAST(s2 AS DOUBLE) / n)
       |           + 2.0 * mu * mu * mu AS m3
       |       FROM hmu)
       |SELECT n AS n_vecs, CAST($k AS BIGINT) AS k,
       |       CASE WHEN m2 > 0 THEN
       |         CAST(round(m3 / pow(m2, 1.5) * 1e6) AS BIGINT) / 1e6
       |       END AS k_occurrence_skew,
       |       max_k_occ, n_antihubs, n_hubs
       |FROM hm""".stripMargin

  /** Mirrors [[graft.ext.Similarity.annRecall]] — the exact and IVF
    * top-k chains (q20/q21's own CTEs) intersected per probe. */
  def annRecall(k: Int, centroidEvery: Int): String =
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)},
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |asg AS (
       |  SELECT vec_id, emb, centroid_id AS cell
       |  FROM (SELECT v.vec_id, v.emb, c.centroid_id,
       |               row_number() OVER (PARTITION BY v.vec_id
       |                 ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                          c.centroid_id) AS crn
       |        FROM v CROSS JOIN cents c)
       |  WHERE crn = 1),
       |ivcj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
       |ivrk AS (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM ivcj),
       |ivk AS (SELECT vec_id, neighbor_id FROM ivrk WHERE rank <= $k),
       |h AS (
       |  SELECT e.vec_id, CAST(count(*) AS BIGINT) AS hits
       |  FROM exk e JOIN ivk i
       |    ON e.vec_id = i.vec_id AND e.neighbor_id = i.neighbor_id
       |  GROUP BY e.vec_id)
       |SELECT x.vec_id,
       |       COALESCE(h.hits, 0) AS hits,
       |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / $k AS recall_at_k
       |FROM (SELECT DISTINCT vec_id FROM exk) x
       |LEFT JOIN h ON x.vec_id = h.vec_id
       |ORDER BY x.vec_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.rankedRetrievalEval]] — q144's
    * exact+IVF chains with BOTH ranks kept, graded relevance k−r+1 off
    * the exact rank, per-position gains quantized to integer 1e-9
    * units BEFORE the per-probe sum (the order-free-sum discipline),
    * and NDCG normalized by the Scala-computed
    * [[graft.ext.Similarity.idcgUnits]] literal. The discount table is
    * generated from [[graft.ext.Similarity.dcgDiscountsSqlValues]] —
    * one set of 17-significant-digit literals feeds both engines. */
  def rankedRetrievalEval(k: Int, centroidEvery: Int): String = {
    import graft.ext.Similarity
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)},
       |exr AS (SELECT vec_id, neighbor_id, rank AS ex_rank FROM exrk
       |        WHERE rank <= $k),
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |asg AS (
       |  SELECT vec_id, emb, centroid_id AS cell
       |  FROM (SELECT v.vec_id, v.emb, c.centroid_id,
       |               row_number() OVER (PARTITION BY v.vec_id
       |                 ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                          c.centroid_id) AS crn
       |        FROM v CROSS JOIN cents c)
       |  WHERE crn = 1),
       |ivcj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
       |ivrk AS (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM ivcj),
       |ivk AS (SELECT vec_id, neighbor_id, rank AS p FROM ivrk
       |        WHERE rank <= $k),
       |disc AS (SELECT p, CAST(disc AS DOUBLE) AS disc
       |         FROM (VALUES ${Similarity.dcgDiscountsSqlValues(k)})
       |           AS d(p, disc)),
       |sc AS (
       |  SELECT i.vec_id,
       |         CASE WHEN e.ex_rank IS NOT NULL
       |              THEN $k + 1 - e.ex_rank ELSE 0 END AS rel,
       |         d.disc, i.p
       |  FROM ivk i
       |  LEFT JOIN exr e ON i.vec_id = e.vec_id
       |                 AND i.neighbor_id = e.neighbor_id
       |  JOIN disc d ON d.p = i.p),
       |pp AS (
       |  SELECT vec_id,
       |         CAST(sum(CAST(round(rel * disc * 1000000000.0) AS BIGINT))
       |           AS BIGINT) AS dcg_units,
       |         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS hits,
       |         min(CASE WHEN rel > 0 THEN p END) AS first_hit
       |  FROM sc GROUP BY 1)
       |SELECT x.vec_id,
       |       COALESCE(pp.hits, 0) AS hits,
       |       round(CAST(COALESCE(pp.dcg_units, 0) AS DOUBLE)
       |         / ${Similarity.idcgUnits(k)}, 6) AS ndcg,
       |       CASE WHEN pp.first_hit IS NOT NULL
       |            THEN round(1.0 / pp.first_hit, 6) ELSE 0.0 END AS rr
       |FROM (SELECT DISTINCT vec_id FROM exk) x
       |LEFT JOIN pp ON x.vec_id = pp.vec_id
       |ORDER BY x.vec_id""".stripMargin
  }

  /** Mirrors [[graft.ext.Similarity.matryoshkaRecall]]: truncated-prefix
    * exact top-k (same 6dp rounding + id tie-break) audited against the
    * full-dimension exact top-k. */
  def matryoshkaRecall(k: Int, dims: Int): String =
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)},
       |tv AS (SELECT vec_id, emb[1:$dims] AS emb FROM v),
       |tcj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM tv a JOIN tv b ON a.vec_id != b.vec_id),
       |trk AS (
       |  SELECT vec_id, neighbor_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM tcj),
       |tk AS (SELECT vec_id, neighbor_id FROM trk WHERE rank <= $k),
       |h AS (
       |  SELECT e.vec_id, CAST(count(*) AS BIGINT) AS hits
       |  FROM exk e JOIN tk t
       |    ON e.vec_id = t.vec_id AND e.neighbor_id = t.neighbor_id
       |  GROUP BY e.vec_id)
       |SELECT x.vec_id,
       |       COALESCE(h.hits, 0) AS hits,
       |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / $k AS recall_at_k
       |FROM (SELECT DISTINCT vec_id FROM exk) x
       |LEFT JOIN h ON x.vec_id = h.vec_id
       |ORDER BY x.vec_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.labelNoise]]. */
  def labelNoise(k: Int): String =
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)}
       |SELECT e.vec_id, a.label,
       |       CAST(sum(CASE WHEN b.label != a.label THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_disagree,
       |       CAST(sum(CASE WHEN b.label != a.label THEN 1 ELSE 0 END) AS BIGINT)
       |         * 2 > $k AS suspect
       |FROM exk e
       |JOIN v a ON e.vec_id = a.vec_id
       |JOIN v b ON e.neighbor_id = b.vec_id
       |GROUP BY e.vec_id, a.label
       |ORDER BY e.vec_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.hardNegatives]]. */
  def hardNegatives(k: Int): String =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
       |  FROM embeddings),
       |cj AS (
       |  SELECT a.vec_id, a.label AS anchor_label, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM v a JOIN v b ON a.label != b.label),
       |rk AS (
       |  SELECT vec_id, anchor_label, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, anchor_label, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  def ivfTopK(k: Int, centroidEvery: Int): String =
    s"""WITH $vecsCte,
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |asg AS (
       |  SELECT vec_id, emb, centroid_id AS cell
       |  FROM (SELECT v.vec_id, v.emb, c.centroid_id,
       |               row_number() OVER (PARTITION BY v.vec_id
       |                 ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                          c.centroid_id) AS crn
       |        FROM v CROSS JOIN cents c)
       |  WHERE crn = 1),
       |cj AS (
       |  SELECT a.vec_id, a.cell, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
       |rk AS (
       |  SELECT vec_id, cell, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, cell, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Similarity.ivfTopKMultiProbe]] — the q21
    * chain with the probe side widened to `crn <= nProbe`. */
  def ivfTopKMultiProbe(k: Int, centroidEvery: Int, nProbe: Int): String =
    s"""WITH $vecsCte,
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |scoredc AS (
       |  SELECT v.vec_id, v.emb, c.centroid_id,
       |         row_number() OVER (PARTITION BY v.vec_id
       |           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                    c.centroid_id) AS crn
       |  FROM v CROSS JOIN cents c),
       |asg AS (SELECT vec_id, emb, centroid_id AS cell FROM scoredc WHERE crn = 1),
       |prb AS (SELECT vec_id, emb, centroid_id AS cell FROM scoredc
       |        WHERE crn <= $nProbe),
       |cj AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
       |  FROM prb a JOIN asg b ON a.cell = b.cell AND a.vec_id != b.vec_id),
       |rk AS (
       |  SELECT vec_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Similarity.ivfProbeSweep]] — the shared exact
    * chain plus one multi-probe arm per probe count (the
    * [[ivfTopKMultiProbe]] CTEs suffixed per arm), summarized to
    * corpus-level mean recall with the half-up micro ratio. */
  def ivfProbeSweep(k: Int, centroidEvery: Int, probes: Seq[Int]): String = {
    val armCtes = probes.map { p =>
      s"""prb_$p AS (SELECT vec_id, emb, centroid_id AS cell FROM scoredc
         |        WHERE crn <= $p),
         |cj_$p AS (
         |  SELECT a.vec_id, b.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
         |  FROM prb_$p a JOIN asg b
         |    ON a.cell = b.cell AND a.vec_id != b.vec_id),
         |rk_$p AS (
         |  SELECT vec_id, neighbor_id,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM cj_$p),
         |ivk_$p AS (SELECT vec_id, neighbor_id FROM rk_$p WHERE rank <= $k),
         |h_$p AS (
         |  SELECT CAST(count(*) AS BIGINT) AS hits
         |  FROM exk e JOIN ivk_$p i
         |    ON e.vec_id = i.vec_id AND e.neighbor_id = i.neighbor_id)""".stripMargin
    }.mkString(",\n")
    val armSelects = probes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS n_probes, nq.n_queries, h_$p.hits,
         |       (((h_$p.hits * 1000000 * 2) + (nq.n_queries * $k))
         |         // (nq.n_queries * $k * 2)) / 1000000.0 AS mean_recall
         |FROM h_$p CROSS JOIN nq""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $vecsCte,
       |${exactTopKCtes(k)},
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |scoredc AS (
       |  SELECT v.vec_id, v.emb, c.centroid_id,
       |         row_number() OVER (PARTITION BY v.vec_id
       |           ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                    c.centroid_id) AS crn
       |  FROM v CROSS JOIN cents c),
       |asg AS (SELECT vec_id, emb, centroid_id AS cell FROM scoredc
       |        WHERE crn = 1),
       |nq AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries
       |       FROM exk),
       |$armCtes
       |$armSelects
       |ORDER BY n_probes""".stripMargin
  }

  /** Mirrors [[graft.ext.Similarity.centroidDrift]] — per-label vs
    * pooled centroids through the q38 integer-unit chain, cosine via
    * the shared pos-ordered list fold. */
  def centroidDrift: String =
    s"""WITH v AS (
       |  SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |e AS (
       |  SELECT label,
       |         unnest(generate_series(1, len(emb))) - 1 AS pos,
       |         unnest(emb) AS x
       |  FROM v),
       |lc AS (
       |  SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
       |         sum(round(x * 1000000)) AS s,
       |         (sum(round(x * 1000000)) / count(*)) / 1000000.0 AS c
       |  FROM e GROUP BY 1, 2),
       |la AS (
       |  SELECT label, max(n) AS n_vecs, list(c ORDER BY pos) AS arr
       |  FROM lc GROUP BY 1),
       |pc AS (
       |  SELECT pos, (sum(s) / sum(n)) / 1000000.0 AS c
       |  FROM lc GROUP BY 1),
       |pa AS (SELECT list(c ORDER BY pos) AS parr FROM pc)
       |SELECT l.label, l.n_vecs,
       |       round(list_cosine_similarity(l.arr, p.parr), 6) AS cosine_to_pooled
       |FROM la l CROSS JOIN pa p ORDER BY l.label""".stripMargin

  /** Mirrors [[graft.ext.Profiling.calibrationBins]] applied to the
    * unigram-LM score with `lang = 'en'` as the positive class. */
  def lmCalibrationBins(bins: Int): String =
    s"""WITH $toksCte,
       |$lmScoreCtes,
       |r AS (
       |  SELECT d.source, s.doc_id, s.avg_logprob AS score,
       |         (d.lang = 'en') AS pos,
       |         row_number() OVER (PARTITION BY d.source
       |           ORDER BY s.avg_logprob, s.doc_id) AS rnk,
       |         count(*) OVER (PARTITION BY d.source) AS n
       |  FROM sc s JOIN documents d USING (doc_id)),
       |b AS (
       |  SELECT source, ((rnk - 1) * $bins) // n AS bin,
       |         CAST(count(*) AS BIGINT) AS n_rows,
       |         CAST(sum(CAST(round(score * 1000000) AS BIGINT)) AS BIGINT) AS su,
       |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |  FROM r GROUP BY 1, 2)
       |SELECT source, bin, n_rows,
       |       (CAST(su AS DOUBLE) / 1000000.0) / CAST(n_rows AS DOUBLE)
       |         AS mean_score,
       |       CAST(np AS DOUBLE) / CAST(n_rows AS DOUBLE) AS pos_rate
       |FROM b ORDER BY source, bin""".stripMargin

  /** SRP-LSH-bucketed top-k (mirrors [[graft.ext.Similarity.srpTopK]]).
    * Hyperplane ±1 signs regenerate from the same md5-derived constants;
    * the projection is an explicit left-to-right ± chain, matching the
    * Spark dot product's summation order bit-for-bit. */
  def srpTopK(k: Int, nBits: Int, dim: Int): String = {
    val bucketExpr = (0 until nBits).map { i =>
      val chain = "0" + (0 until dim).map { j =>
        val sgn = if (Portable.h60Local(s"srp-$i-$j") % 2 == 0) "+" else "-"
        s" $sgn emb[${j + 1}]"
      }.mkString
      s"CASE WHEN ($chain) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH $vecsCte,
       |b AS (
       |  SELECT vec_id, emb,
       |         $bucketExpr AS bucket
       |  FROM v),
       |cj AS (
       |  SELECT a.vec_id, a.bucket, b2.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(a.emb, b2.emb), 6) AS cosine
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id != b2.vec_id),
       |rk AS (
       |  SELECT vec_id, bucket, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, bucket, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin
  }

  /** Mirrors [[graft.ext.Similarity.kmeans]]: `iters` full Lloyd rounds
    * from the id ≡ 0 (mod seedEvery) seeds. Both engines walk identical
    * paths because cosines round to 6 before every argmax (cluster-id
    * tie-break) and centroid components accumulate as integral 1e-6
    * units then round to 6 — the [[graft.gold]] exact-money discipline
    * applied to float vectors. */
  def kmeans(iters: Int, seedEvery: Int): String =
    s"""WITH ${kmeansCtes(iters, seedEvery).mkString(",\n")}
       |SELECT vec_id, cluster, cos AS cosine FROM a$iters ORDER BY vec_id""".stripMargin

  /** The Lloyd CTE chain shared by [[kmeans]] and [[semanticDedup]]:
    * yields `a$iters` = (vec_id, emb, cluster, cos). */
  private def kmeansCtes(iters: Int, seedEvery: Int): Seq[String] = {
    require(iters >= 1, "kmeans needs at least one iteration")
    def assign(i: Int, cents: String) =
      s"""a$i AS (
         |  SELECT vec_id, emb, cluster, cos FROM (
         |    SELECT v.vec_id, v.emb, c.cluster,
         |           round(list_cosine_similarity(v.emb, c.cemb), 6) AS cos,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
         |                      c.cluster) AS rn
         |    FROM v CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def update(i: Int) =
      s"""c$i AS (
         |  SELECT cluster, list(c ORDER BY pos) AS cemb FROM (
         |    SELECT cluster, pos,
         |           round((sum(round(x * 1000000)) / count(*)) / 1000000.0, 6) AS c
         |    FROM (SELECT cluster,
         |                 unnest(generate_series(1, len(emb))) AS pos,
         |                 unnest(emb) AS x
         |          FROM a$i) GROUP BY 1, 2) GROUP BY 1)""".stripMargin
    Seq(
      "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
      s"c0 AS (SELECT vec_id AS cluster, emb AS cemb FROM v WHERE vec_id % $seedEvery = 0)") ++
      (1 to iters).flatMap { i =>
        Seq(assign(i, s"c${i - 1}")) ++ (if (i < iters) Seq(update(i)) else Nil)
      }
  }

  /** Mirrors [[graft.ext.Similarity.semanticDedup]]: Lloyd cells, then
    * within-cell pairwise rounded cosine ≥ tau, closed transitively with
    * the recursive min-reachable-id CTE (the [[dupClusters]] idiom). */
  def semanticDedup(tau: Double, iters: Int, seedEvery: Int): String =
    s"""WITH RECURSIVE ${kmeansCtes(iters, seedEvery).mkString(",\n")},
       |dp AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM a$iters x JOIN a$iters y
       |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  WHERE round(list_cosine_similarity(x.emb, y.emb), 6) >= $tau),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM dp
       |  UNION
       |  SELECT id_b, id_a FROM dp),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.id),
       |cc AS (SELECT id, min(r) AS dup_group FROM reach GROUP BY 1)
       |SELECT a.vec_id, a.cluster AS cell,
       |       COALESCE(cc.dup_group, a.vec_id) AS dup_group,
       |       COALESCE(cc.dup_group, a.vec_id) = a.vec_id AS is_kept
       |FROM a$iters a LEFT JOIN cc ON cc.id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.simplifiedSilhouette]]: the Lloyd
    * chain's final assignment, its integer-unit centroid means (the
    * update-step device over `a$iters`), then per-point a/b centroid
    * distances and the 1e-6-quantized mean s per cell. */
  def simplifiedSilhouette(iters: Int, seedEvery: Int): String =
    s"""WITH ${kmeansCtes(iters, seedEvery).mkString(",\n")},
       |cm AS (
       |  SELECT cluster, list(c ORDER BY pos) AS cemb FROM (
       |    SELECT cluster, pos,
       |           round((sum(round(x * 1000000)) / count(*)) / 1000000.0, 6) AS c
       |    FROM (SELECT cluster,
       |                 unnest(generate_series(1, len(emb))) AS pos,
       |                 unnest(emb) AS x
       |          FROM a$iters) GROUP BY 1, 2) GROUP BY 1),
       |sd AS (
       |  SELECT a.vec_id, a.cluster, m.cluster AS mcluster,
       |         1.0 - round(list_cosine_similarity(a.emb, m.cemb), 6) AS d
       |  FROM a$iters a CROSS JOIN cm m),
       |sab AS (
       |  SELECT vec_id, cluster,
       |         min(CASE WHEN mcluster = cluster THEN d END) AS a_d,
       |         min(CASE WHEN mcluster <> cluster THEN d END) AS b_d
       |  FROM sd GROUP BY 1, 2),
       |ssc AS (
       |  SELECT vec_id, cluster,
       |         CAST(round(CASE
       |             WHEN b_d IS NULL THEN NULL
       |             WHEN greatest(a_d, b_d) = 0 THEN 0.0
       |             ELSE (b_d - a_d) / greatest(a_d, b_d) END * 1000000)
       |           AS BIGINT) AS su
       |  FROM sab)
       |SELECT cluster AS cell, CAST(count(*) AS BIGINT) AS n_points,
       |       round(CAST(sum(su) AS BIGINT)
       |             / CAST(count(*) AS BIGINT) / 1e6, 6) AS mean_silhouette
       |FROM ssc GROUP BY 1 ORDER BY cell""".stripMargin

  /** Mirrors [[graft.ext.Similarity.hardNegativesInCells]]: the Lloyd
    * CTE chain supplies the cell of every vector, then the different-
    * label top-k runs within cells only. */
  def hardNegativesInCells(k: Int, iters: Int, seedEvery: Int): String =
    s"""WITH ${kmeansCtes(iters, seedEvery).mkString(",\n")},
       |lv AS (SELECT vec_id, label FROM embeddings),
       |cj AS (
       |  SELECT x.vec_id, x.cluster AS cell, lx.label AS anchor_label,
       |         y.vec_id AS neighbor_id,
       |         round(list_cosine_similarity(x.emb, y.emb), 6) AS cosine
       |  FROM a$iters x JOIN a$iters y ON x.cluster = y.cluster
       |  JOIN lv lx ON lx.vec_id = x.vec_id
       |  JOIN lv ly ON ly.vec_id = y.vec_id
       |  WHERE lx.label != ly.label),
       |rk AS (
       |  SELECT vec_id, cell, anchor_label, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM cj)
       |SELECT vec_id, cell, anchor_label, neighbor_id, cosine, rank FROM rk
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Dedup.decontaminate]] with the benchmark set
    * `doc_id ≡ 0 (mod modEvery)`. */
  def decontaminate(n: Int, modEvery: Int): String =
    s"""WITH $toksCte,
       |shn AS (
       |  SELECT doc_id, unnest(${Portable.shinglesSql("t", n)}) AS s FROM toks),
       |bench AS (
       |  SELECT DISTINCT s FROM shn WHERE doc_id % $modEvery = 0)
       |SELECT doc_id, count(*) AS n_shared_ngrams
       |FROM (SELECT doc_id, s FROM shn WHERE doc_id % $modEvery <> 0) corp
       |JOIN bench USING (s)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.Dedup.exactSubstringDedup]]: positional
    * n-grams keyed on the portable h60, corpus-duplicated grams mark
    * n-token coverage, merged spans excised from the kept text. */
  def exactSubstringDedup(n: Int): String = {
    val nm1 = n - 1
    s"""WITH $toksCte,
       |esk AS (SELECT doc_id, t, len(t) AS n FROM toks),
       |eso AS (
       |  SELECT doc_id, t, unnest(generate_series(1, n - $nm1)) AS start
       |  FROM esk WHERE n >= $n),
       |esg AS (
       |  SELECT doc_id, start,
       |         ${h60(s"array_to_string(list_slice(t, start, start + $nm1), ' ')")} AS g
       |  FROM eso),
       |esd AS (SELECT g FROM esg GROUP BY 1 HAVING count(*) > 1),
       |ess AS (SELECT doc_id, start AS p, 1 AS st
       |        FROM esg JOIN esd USING (g)),
       |est AS (
       |  SELECT doc_id, n, unnest(generate_series(1, n)) AS p,
       |         unnest(t) AS tok
       |  FROM esk),
       |esc AS (
       |  SELECT k.doc_id, k.n, k.p, k.tok,
       |         max(coalesce(s.st, 0)) OVER (PARTITION BY k.doc_id
       |           ORDER BY k.p ROWS BETWEEN $nm1 PRECEDING AND CURRENT ROW)
       |           AS covered
       |  FROM est k LEFT JOIN ess s ON k.doc_id = s.doc_id AND k.p = s.p),
       |esf AS (
       |  SELECT *, CASE WHEN covered = 1 AND coalesce(lag(covered) OVER (
       |      PARTITION BY doc_id ORDER BY p), 0) = 0 THEN 1 ELSE 0 END
       |      AS new_span
       |  FROM esc)
       |SELECT doc_id,
       |       CAST(max(n) AS BIGINT) AS n_tokens,
       |       CAST(sum(covered) AS BIGINT) AS n_removed,
       |       CAST(sum(new_span) AS BIGINT) AS n_spans,
       |       coalesce(string_agg(CASE WHEN covered = 0 THEN tok END,
       |         ' ' ORDER BY p), '') AS kept_text
       |FROM esf GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.chunk]]. */
  def chunk(chunkSize: Int, overlap: Int): String = {
    val stride = chunkSize - overlap
    s"""WITH $toksCte,
       |c AS (
       |  SELECT doc_id, len(t) AS n, t,
       |         unnest(range(0,
       |           (CASE WHEN len(t) > $chunkSize THEN len(t) - $chunkSize ELSE 0 END
       |              + ${stride - 1}) // $stride + 1)) AS k
       |  FROM toks)
       |SELECT doc_id, k AS chunk_id,
       |       least($chunkSize, n - k * $stride) AS n_tokens,
       |       array_to_string(
       |         list_slice(t, k * $stride + 1, k * $stride + $chunkSize), ' ')
       |         AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.packSequences]]. */
  def packSequences(budget: Int, shards: Int): String =
    s"""WITH $toksCte,
       |base AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |         ${h60("CAST(doc_id AS VARCHAR)")} % $shards AS shard
       |  FROM toks),
       |cum AS (
       |  SELECT doc_id, shard, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS UNBOUNDED PRECEDING) AS c
       |  FROM base)
       |SELECT doc_id, shard, n_tokens, CAST((c - n_tokens) // $budget AS BIGINT) AS pack_id
       |FROM cum ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.Curation.packCorpus]]: the curated corpus
    * ([[curatedCorpus]], embedded as a nested-WITH subquery) chunked and
    * packed per (split, shard). */
  def packCorpus(
      minQuality: Double, lang: String, minJaccard: Double,
      chunkSize: Int, overlap: Int, budget: Int, shards: Int): String = {
    val stride = chunkSize - overlap
    s"""WITH curated AS (${curatedCorpus(minQuality, lang, minJaccard)}),
       |ctoks AS (
       |  SELECT d.doc_id, c.split, ${Portable.tokensSql("d.text")} AS t
       |  FROM documents d JOIN curated c USING (doc_id)),
       |ch AS (
       |  SELECT doc_id, split, len(t) AS n,
       |         unnest(range(0,
       |           (CASE WHEN len(t) > $chunkSize THEN len(t) - $chunkSize ELSE 0 END
       |              + ${stride - 1}) // $stride + 1)) AS chunk_id
       |  FROM ctoks),
       |chn AS (
       |  SELECT doc_id, split, chunk_id,
       |         least($chunkSize, n - chunk_id * $stride) AS n_tokens,
       |         ${h60("CAST(doc_id AS VARCHAR)")} % $shards AS shard
       |  FROM ch),
       |cum AS (
       |  SELECT doc_id, split, chunk_id, shard, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY split, shard
       |           ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING) AS c
       |  FROM chn)
       |SELECT doc_id, chunk_id, split, shard, n_tokens,
       |       CAST((c - n_tokens) // $budget AS BIGINT) AS pack_id
       |FROM cum ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.tokenEntropy]]. */
  def tokenEntropy: String =
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
       |         sum(CAST(round(c * ln(c) * 1e9) AS BIGINT)) AS sn
       |  FROM wc GROUP BY 1)
       |SELECT doc_id, n AS n_tokens,
       |       round(ln(n) - (CAST(sn AS DOUBLE) / 1e9) / n, 6) AS token_entropy
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.lmScore]]. */
  /** Shared unigram-LM scoring CTE chain (the q76 contract), ending in
    * `sc(doc_id, n_tokens, avg_logprob)`. Assumes `toks` is in scope. */
  private def lmScoreCtes: String =
    s"""tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |dtf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
       |model AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM model),
       |scored AS (
       |  SELECT d.doc_id, d.tf,
       |         d.tf * CAST(round(ln(CAST(m.c AS DOUBLE) / t.total) * 1e9) AS BIGINT)
       |           AS units
       |  FROM dtf d JOIN model m USING (w) CROSS JOIN tot t),
       |sc AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |         round((CAST(sum(units) AS DOUBLE) / 1e9)
       |               / CAST(sum(tf) AS BIGINT), 6) AS avg_logprob
       |  FROM scored GROUP BY 1)""".stripMargin

  def lmScore: String =
    s"""WITH $toksCte,
       |$lmScoreCtes
       |SELECT doc_id, n_tokens, avg_logprob FROM sc ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.Similarity.pqCodeBalance]] — same PQ chain as
    * the q170 encode oracle, rolled to per-block code-usage stats. */
  def pqCodeBalance(blocks: Int, seedEvery: Int): String =
    s"""WITH ${pqChainCtes(blocks, seedEvery)},
       |cb AS (SELECT blk, code, count(*) AS c FROM pqa2 GROUP BY 1, 2),
       |ca AS (SELECT blk, count(*) AS n_codes_used,
       |              CAST(sum(c) AS BIGINT) AS n_vecs, max(c) AS top_c,
       |              CAST(sum(CAST(round(c * ln(c) * 1e9) AS BIGINT))
       |                AS BIGINT) AS sn
       |       FROM cb GROUP BY 1)
       |SELECT blk, n_codes_used, n_vecs,
       |       ((top_c * 1000000 * 2 + n_vecs) // (n_vecs * 2)) / 1000000.0
       |         AS top_code_share,
       |       round(ln(n_vecs) - (sn / 1e9) / n_vecs, 6) AS code_entropy
       |FROM ca ORDER BY blk""".stripMargin

  /** Mirrors [[graft.ext.Similarity.embeddingNormAudit]]. */
  def embeddingNormAudit: String =
    s"""WITH nv AS (
       |  SELECT label,
       |         CAST(round(sqrt(list_sum(list_transform(
       |             CAST(embedding AS DOUBLE[]),
       |             x -> CAST(round(x * x * 1000000000.0) AS BIGINT)))
       |           / 1000000000.0) * 1000000) AS BIGINT) AS nq
       |  FROM embeddings),
       |st AS (SELECT label, count(*) AS n_vecs,
       |              quantile_cont(nq, 0.5) AS q50,
       |              quantile_cont(nq, 0.95) AS q95
       |       FROM nv GROUP BY 1),
       |ou AS (SELECT v.label, st.n_vecs, st.q50, st.q95,
       |              CAST(sum(CASE WHEN v.nq * 2 < st.q50
       |                    OR CAST(v.nq AS DOUBLE) > st.q50 * 2
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |       FROM nv v JOIN st USING (label) GROUP BY 1, 2, 3, 4)
       |SELECT label, n_vecs,
       |       round(q50 / 1000000.0, 6) AS p50_norm,
       |       round(q95 / 1000000.0, 6) AS p95_norm, n_outliers,
       |       ((n_outliers * 1000000 * 2 + n_vecs) // (n_vecs * 2))
       |         / 1000000.0 AS outlier_share
       |FROM ou ORDER BY label""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.lmLengthBias]] — same lmScore
    * chain, binary-string-length bucket, truncating micro means. */
  def lmLengthBias: String =
    s"""WITH $toksCte,
       |$lmScoreCtes,
       |lb AS (SELECT doc_id, n_tokens, length(bin(n_tokens)) AS bucket,
       |              CAST(round(avg_logprob * 1e6) AS BIGINT) AS lp
       |       FROM sc),
       |la AS (SELECT bucket, count(*) AS n_docs,
       |              CAST(sum(n_tokens) AS BIGINT) AS st,
       |              CAST(sum(lp) AS BIGINT) AS slp
       |       FROM lb GROUP BY 1)
       |SELECT bucket, n_docs,
       |       ((st * 1000000 * 2 + n_docs) // (n_docs * 2)) / 1000000.0
       |         AS avg_tokens,
       |       (CASE WHEN slp >= 0
       |             THEN (slp * 2 + n_docs) // (n_docs * 2)
       |             ELSE -(((-slp) * 2 + n_docs) // (n_docs * 2))
       |        END) / 1000000.0 AS mean_logprob
       |FROM la ORDER BY bucket""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.ngramNovelty]]. */
  def ngramNovelty(bucketSize: Int): String =
    s"""WITH $toksCte,
       |nvs AS (SELECT DISTINCT bucket, g FROM (
       |  SELECT doc_id // $bucketSize AS bucket,
       |         unnest(${Portable.shinglesSql("t", 3)}) AS g
       |  FROM toks) z),
       |nvf AS (SELECT g, min(bucket) AS fb FROM nvs GROUP BY 1),
       |nva AS (SELECT s.bucket, count(*) AS n_grams,
       |               CAST(sum(CASE WHEN s.bucket = f.fb THEN 1 ELSE 0 END)
       |                 AS BIGINT) AS n_new
       |        FROM nvs s JOIN nvf f USING (g) GROUP BY 1)
       |SELECT bucket, n_grams, n_new,
       |       ((n_new * 1000000 * 2 + n_grams) // (n_grams * 2)) / 1000000.0
       |         AS novelty_share
       |FROM nva ORDER BY bucket""".stripMargin

  /** Shared CTE: [[qualityScore]]'s rounded score as exact integer
    * micro-units, `q(doc_id, qu)`. */
  private def qualityMicroCte: String = {
    val stopList = TextAnalysis.qualityStopwords.map(w => s"'$w'").mkString(", ")
    val t = Portable.tokensSql("text")
    s"""q AS (
       |  SELECT doc_id,
       |         CAST(round(round(0.5 * least(1.0, len($t) / 64.0)
       |           + 0.25 * CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
       |                     AS DOUBLE) / length(text)
       |           + 0.25 * least(1.0,
       |               CAST(len(list_filter($t, x -> x IN ($stopList)))
       |                 AS DOUBLE) / len($t) * 4.0), 6) * 1e6) AS BIGINT) AS qu
       |  FROM documents)""".stripMargin
  }

  /** Mirrors [[graft.ext.Profiling.prCurve]] over the quality score
    * predicting lang = 'en'. */
  def prCurveQualityEn: String =
    s"""WITH $qualityMicroCte,
       |pb AS (SELECT q.qu, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
       |       FROM q JOIN documents d USING (doc_id)),
       |pt AS (SELECT count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
       |       FROM pb),
       |px AS (SELECT t.tq, b.qu, b.pos FROM pb b CROSS JOIN
       |         (SELECT unnest(range(1, 10)) AS tq) t),
       |pa AS (SELECT tq,
       |              CAST(sum(CASE WHEN qu >= tq * 100000 THEN 1 ELSE 0 END)
       |                AS BIGINT) AS n_pred,
       |              CAST(sum(CASE WHEN qu >= tq * 100000 THEN pos
       |                   ELSE 0 END) AS BIGINT) AS tp
       |       FROM px GROUP BY 1)
       |SELECT CAST(tq AS DOUBLE) / 10 AS threshold, n_pred, tp,
       |       ((tp * 1000000 * 2 + n_pred) // (n_pred * 2)) / 1000000.0
       |         AS "precision",
       |       ((tp * 1000000 * 2 + n_pos) // (n_pos * 2)) / 1000000.0
       |         AS recall
       |FROM pa CROSS JOIN pt WHERE n_pred > 0 AND n_pos > 0
       |ORDER BY threshold""".stripMargin

  /** Mirrors [[graft.ext.Profiling.calibrationBins]] over the quality
    * score predicting lang=en — same micro-unit score CTE as
    * [[prCurveQualityEn]], bin edge as integer division. */
  def calibrationBinsQualityEn: String =
    s"""WITH $qualityMicroCte,
       |cb AS (SELECT q.qu, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
       |       FROM q JOIN documents d USING (doc_id)),
       |cbb AS (SELECT GREATEST(LEAST(qu * 10 // 1000000, 9), 0) AS bin, qu, pos FROM cb),
       |cba AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(qu) AS BIGINT) AS ssq,
       |               CAST(sum(pos) AS BIGINT) AS n_pos
       |        FROM cbb GROUP BY 1)
       |SELECT bin, round(CAST(bin AS DOUBLE) / 10, 6) AS bin_lo, n, n_pos,
       |       ((ssq * 2 + n) // (n * 2)) / 1000000.0 AS mean_score,
       |       ((n_pos * 1000000 * 2 + n) // (n * 2)) / 1000000.0 AS pos_rate,
       |       round(abs(((ssq * 2 + n) // (n * 2)) / 1000000.0
       |                 - ((n_pos * 1000000 * 2 + n) // (n * 2)) / 1000000.0),
       |             6) AS gap
       |FROM cba ORDER BY bin""".stripMargin

  /** Mirrors [[graft.ext.Curation.sourceAblation]] — the same
    * [[qualityMicroCte]] micro-unit score, per-source complement sums,
    * half-up micro ratios, integer-difference deltas. */
  def sourceAblation: String =
    s"""WITH $qualityMicroCte,
       |ab AS (SELECT d.source, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END
       |              AS en,
       |              CAST(length(d.text) AS BIGINT) AS nc, q.qu
       |       FROM documents d JOIN q USING (doc_id)),
       |ap AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
       |              CAST(sum(qu) AS HUGEINT) AS q_s,
       |              CAST(sum(en) AS BIGINT) AS e_s,
       |              CAST(sum(nc) AS HUGEINT) AS c_s
       |       FROM ab GROUP BY 1),
       |at2 AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
       |               CAST(sum(q_s) AS HUGEINT) AS q2,
       |               CAST(sum(e_s) AS BIGINT) AS e,
       |               CAST(sum(c_s) AS HUGEINT) AS c
       |        FROM ap)
       |SELECT source, n_s AS n_docs,
       |       ((((q2 - q_s) * 2) + (n - n_s)) // ((n - n_s) * 2))
       |         / 1000000.0 AS mean_quality_wo,
       |       round((((((q2 - q_s) * 2) + (n - n_s)) // ((n - n_s) * 2))
       |         - (((q2 * 2) + n) // (n * 2))) / 1000000.0, 6)
       |         AS delta_quality,
       |       ((((e - e_s) * 1000000 * 2) + (n - n_s)) // ((n - n_s) * 2))
       |         / 1000000.0 AS en_share_wo,
       |       round((((((e - e_s) * 1000000 * 2) + (n - n_s))
       |           // ((n - n_s) * 2))
       |         - (((e * 1000000 * 2) + n) // (n * 2))) / 1000000.0, 6)
       |         AS delta_en_share,
       |       ((((c - c_s) * 1000000 * 2) + (n - n_s)) // ((n - n_s) * 2))
       |         / 1000000.0 AS mean_chars_wo,
       |       round((((((c - c_s) * 1000000 * 2) + (n - n_s))
       |           // ((n - n_s) * 2))
       |         - (((c * 1000000 * 2) + n) // (n * 2))) / 1000000.0, 6)
       |         AS delta_chars
       |FROM ap CROSS JOIN at2 WHERE n > n_s ORDER BY source""".stripMargin

  /** Mirrors [[graft.ext.Profiling.brierDecomposition]] over the
    * quality score vs lang=en — same micro CTE as
    * [[calibrationBinsQualityEn]], identical double chains,
    * per-bin terms quantized 1e-9 before the rollup. */
  def brierQualityEn: String =
    s"""WITH $qualityMicroCte,
       |bb AS (SELECT q.qu AS sq,
       |              CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS o
       |       FROM q JOIN documents d USING (doc_id)),
       |bt AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(CAST(sq AS HUGEINT) * sq) AS HUGEINT)
       |                AS spp,
       |              CAST(sum(CASE WHEN o = 1 THEN sq ELSE 0 END)
       |                AS HUGEINT) AS spo,
       |              CAST(sum(o) AS BIGINT) AS so
       |       FROM bb),
       |bk AS (SELECT GREATEST(LEAST(sq * 10 // 1000000, 9), 0) AS bin,
       |              CAST(count(*) AS BIGINT) AS nk,
       |              CAST(sum(sq) AS HUGEINT) AS spk,
       |              CAST(sum(o) AS BIGINT) AS ok
       |       FROM bb GROUP BY 1),
       |bm AS (SELECT CAST(sum(CAST(round(nk
       |                * (CAST(spk AS DOUBLE) / nk / 1e6
       |                   - CAST(ok AS DOUBLE) / nk)
       |                * (CAST(spk AS DOUBLE) / nk / 1e6
       |                   - CAST(ok AS DOUBLE) / nk) * 1e9) AS BIGINT))
       |              AS BIGINT) AS srel,
       |              CAST(sum(CAST(round(nk
       |                * (CAST(ok AS DOUBLE) / nk
       |                   - CAST(so AS DOUBLE) / n)
       |                * (CAST(ok AS DOUBLE) / nk
       |                   - CAST(so AS DOUBLE) / n) * 1e9) AS BIGINT))
       |              AS BIGINT) AS sres
       |       FROM bk CROSS JOIN bt)
       |SELECT n,
       |       round((CAST(spp AS DOUBLE) - 2e6 * CAST(spo AS DOUBLE)
       |         + 1e12 * CAST(so AS DOUBLE)) / 1e12 / CAST(n AS DOUBLE),
       |         6) AS brier,
       |       round(srel / 1e9 / n, 6) AS reliability,
       |       round(sres / 1e9 / n, 6) AS resolution,
       |       round((CAST(so AS DOUBLE) / n)
       |         * (1.0 - CAST(so AS DOUBLE) / n), 6) AS uncertainty,
       |       round((CAST(spp AS DOUBLE) - 2e6 * CAST(spo AS DOUBLE)
       |           + 1e12 * CAST(so AS DOUBLE)) / 1e12 / CAST(n AS DOUBLE)
       |         - (srel / 1e9 / n - sres / 1e9 / n
       |            + (CAST(so AS DOUBLE) / n)
       |              * (1.0 - CAST(so AS DOUBLE) / n)), 6) AS within_bin
       |FROM bt CROSS JOIN bm""".stripMargin

  /** Mirrors [[graft.ext.Profiling.isotonicCalibration]] over the
    * quality score vs lang=en — same micro CTE and bin edge as
    * [[calibrationBinsQualityEn]]; the PAV fit via the minimax
    * identity over half-up micro interval means (exact integers on
    * both engines). */
  def isotonicQualityEn: String =
    s"""WITH $qualityMicroCte,
       |ibb AS (SELECT GREATEST(LEAST(q.qu * 10 // 1000000, 9), 0) AS bin,
       |               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
       |        FROM q JOIN documents d USING (doc_id)),
       |iba AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(pos) AS BIGINT) AS n_pos
       |        FROM ibb GROUP BY 1),
       |ibp AS (SELECT bin, n, n_pos,
       |               CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |               CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cs
       |        FROM iba),
       |ivv AS (SELECT j.bin AS jb, k.bin AS kb,
       |               (((k.cs - (j.cs - j.n_pos)) * 1000000 * 2)
       |                + (k.cn - (j.cn - j.n)))
       |               // ((k.cn - (j.cn - j.n)) * 2) AS avg_u
       |        FROM ibp j JOIN ibp k ON j.bin <= k.bin),
       |ifm AS (SELECT i.bin AS ib, v.jb, min(v.avg_u) AS mn
       |        FROM ivv v JOIN ibp i ON v.jb <= i.bin AND i.bin <= v.kb
       |        GROUP BY 1, 2),
       |iff AS (SELECT ib, max(mn) AS iso_u FROM ifm GROUP BY 1)
       |SELECT p.bin, round(CAST(p.bin AS DOUBLE) / 10, 6) AS bin_lo,
       |       p.n, p.n_pos,
       |       ((p.n_pos * 1000000 * 2 + p.n) // (p.n * 2)) / 1000000.0
       |         AS raw_rate,
       |       f.iso_u / 1000000.0 AS iso_rate
       |FROM ibp p JOIN iff f ON p.bin = f.ib ORDER BY p.bin""".stripMargin

  /** Mirrors [[graft.ext.Dedup.canonicalPolicyAudit]] — the same
    * [[qualityMicroCte]] micro score; the near-dup group key is the
    * q25 min-shingle fingerprint (singleton-salted when NULL);
    * best-quality winner via the (qu DESC, doc_id) window, min-id
    * winner via plain min. */
  def canonicalPolicyAudit: String =
    s"""WITH $qualityMicroCte,
       |kpt AS (
       |  SELECT doc_id, ${Portable.tokensSql("text")} AS t FROM documents),
       |kpf AS (
       |  SELECT doc_id,
       |         list_min(list_transform(${Portable.shinglesSql("t")},
       |           s -> ${h60("s")})) AS fp
       |  FROM kpt),
       |kpd AS (SELECT f.doc_id,
       |               COALESCE(f.fp, ${h60(
                         "'singleton:' || CAST(f.doc_id AS VARCHAR)")})
       |                 AS h,
       |               q.qu
       |        FROM kpf f JOIN q USING (doc_id)),
       |kpw AS (SELECT h, doc_id AS best_id, qu AS qu_best,
       |               row_number() OVER (PARTITION BY h
       |                 ORDER BY qu DESC, doc_id) AS rn
       |        FROM kpd),
       |kpb AS (SELECT h, best_id, qu_best FROM kpw WHERE rn = 1),
       |kpm AS (SELECT h, CAST(count(*) AS BIGINT) AS n,
       |               min(doc_id) AS minid_id
       |        FROM kpd GROUP BY 1),
       |kpj AS (SELECT m.h, m.n, m.minid_id, b.best_id, b.qu_best,
       |               d2.qu AS qu_minid
       |        FROM kpm m
       |        JOIN kpb b USING (h)
       |        JOIN kpd d2 ON d2.doc_id = m.minid_id AND d2.h = m.h),
       |kpa AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
       |               CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
       |                 AS BIGINT) AS n_dup_groups,
       |               CAST(sum(CASE WHEN best_id != minid_id
       |                    THEN 1 ELSE 0 END) AS BIGINT)
       |                 AS n_policy_flips,
       |               CAST(sum(qu_best) AS HUGEINT) AS sb,
       |               CAST(sum(qu_minid) AS HUGEINT) AS sm
       |        FROM kpj)
       |SELECT n_groups, n_dup_groups, n_policy_flips,
       |       ((sb * 2 + n_groups) // (n_groups * 2)) / 1000000.0
       |         AS mean_quality_best,
       |       ((sm * 2 + n_groups) // (n_groups * 2)) / 1000000.0
       |         AS mean_quality_minid,
       |       (((sb - sm) * 2 + n_groups) // (n_groups * 2)) / 1000000.0
       |         AS mean_quality_gain
       |FROM kpa""".stripMargin

  /** Mirrors [[graft.ext.Similarity.cellLabelPurity]] — the
    * [[ivfTopK]] assignment chain, then per-cell majority label with
    * (count desc, label asc) tie-break. */
  def cellLabelPurity(centroidEvery: Int): String =
    s"""WITH $vecsCte,
       |cents AS (
       |  SELECT vec_id AS centroid_id, emb AS cemb FROM v
       |  WHERE vec_id % $centroidEvery = 0),
       |asg AS (
       |  SELECT vec_id, label, cell
       |  FROM (SELECT v.vec_id, v.label, c.centroid_id AS cell,
       |               row_number() OVER (PARTITION BY v.vec_id
       |                 ORDER BY round(list_cosine_similarity(v.emb, c.cemb), 6) DESC,
       |                          c.centroid_id) AS crn
       |        FROM v CROSS JOIN cents c)
       |  WHERE crn = 1),
       |jt AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS c
       |       FROM asg GROUP BY 1, 2),
       |jw AS (SELECT *,
       |              CAST(sum(c) OVER (PARTITION BY cell) AS BIGINT)
       |                AS n_vecs,
       |              CAST(count(*) OVER (PARTITION BY cell) AS BIGINT)
       |                AS n_labels,
       |              row_number() OVER (PARTITION BY cell
       |                ORDER BY c DESC, label) AS rn
       |       FROM jt)
       |SELECT cell, n_vecs, n_labels, label AS top_label,
       |       ((c * 1000000 * 2 + n_vecs) // (n_vecs * 2)) / 1000000.0
       |         AS purity
       |FROM jw WHERE rn = 1 ORDER BY cell""".stripMargin

  /** Mirrors [[graft.ext.Dedup.qualityDupDeciles]] — the quality micro
    * units come from the same [[qualityMicroCte]] expressions. */
  def qualityDupDeciles: String = {
    s"""WITH $qualityMicroCte,
       |d AS (SELECT doc_id, md5(text) AS h FROM documents),
       |k AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY 1),
       |du AS (SELECT d.doc_id,
       |              CASE WHEN d.doc_id != k.keep_id THEN 1 ELSE 0 END AS is_dup
       |       FROM d JOIN k USING (h)),
       |j AS (SELECT q.doc_id, q.qu, du.is_dup,
       |             ntile(10) OVER (ORDER BY q.qu ASC, q.doc_id ASC) AS decile
       |      FROM q JOIN du USING (doc_id)),
       |a AS (SELECT decile, count(*) AS n_docs,
       |             CAST(sum(is_dup) AS BIGINT) AS n_dups,
       |             CAST(sum(qu) AS BIGINT) AS sq
       |      FROM j GROUP BY 1)
       |SELECT decile, n_docs, n_dups,
       |       ((n_dups * 1000000 * 2 + n_docs) // (n_docs * 2)) / 1000000.0
       |         AS dup_share,
       |       ((sq * 2 + n_docs) // (n_docs * 2)) / 1000000.0 AS mean_quality
       |FROM a ORDER BY decile""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.lmPruneBySource]] — the keep
    * predicate is the same integer rewrite of rank ≤ ⌈p·n⌉. */
  def lmPruneBySource(keepNum: Int, keepDen: Int): String =
    s"""WITH $toksCte,
       |$lmScoreCtes,
       |r AS (
       |  SELECT d.source, s.avg_logprob,
       |         row_number() OVER (PARTITION BY d.source
       |           ORDER BY s.avg_logprob DESC, s.doc_id) AS rnk,
       |         count(*) OVER (PARTITION BY d.source) AS n
       |  FROM sc s JOIN documents d USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN $keepDen * (rnk - 1) < $keepNum * n
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       min(CASE WHEN $keepDen * (rnk - 1) < $keepNum * n
       |                THEN avg_logprob END) AS cutoff_logprob
       |FROM r GROUP BY 1 ORDER BY source""".stripMargin

  /** Mirrors [[graft.ext.Dedup.dupNgramShare]]. */
  def dupNgramShare(n: Int): String =
    s"""WITH $toksCte,
       |sh AS (SELECT doc_id, unnest(${Portable.shinglesSql("t", n)}) AS g FROM toks),
       |gc AS (SELECT g, count(*) AS nd FROM sh GROUP BY 1)
       |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |       CAST(CAST(sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |            AS DOUBLE) / CAST(count(*) AS BIGINT) AS dup_share
       |FROM sh s JOIN gc USING (g)
       |GROUP BY 1 ORDER BY s.doc_id""".stripMargin

  /** Mirrors [[graft.ext.Experiment.cupedReadout]] — θ and the means
    * replicate the Spark side's double chain parenthesis-for-
    * parenthesis over the same exact integer sums. */
  def cupedReadout(splitTs: String, salt: String): String = {
    val bucket = graft.ext.Sampling.hashBucketSql("user_id", salt, 2)
    s"""WITH pu AS (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN ts < TIMESTAMP '$splitTs'
       |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
       |         CAST(sum(CASE WHEN ts >= TIMESTAMP '$splitTs'
       |           THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
       |         CASE WHEN $bucket = 0 THEN 'control' ELSE 'treatment' END AS variant
       |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
       |  GROUP BY user_id),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM pu),
       |th AS (
       |  SELECT n, sx,
       |         CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN 0
       |              ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS theta
       |  FROM g),
       |v AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS nv,
       |         CAST(sum(x) AS BIGINT) AS sxv, CAST(sum(y) AS BIGINT) AS syv
       |  FROM pu GROUP BY variant)
       |SELECT v.variant, v.nv AS n_users,
       |       (CAST(v.syv AS DOUBLE) / CAST(v.nv AS DOUBLE)) / 100.0 AS mean_y,
       |       (CAST(v.syv AS DOUBLE) / CAST(v.nv AS DOUBLE)) / 100.0
       |         - th.theta * ((CAST(v.sxv AS DOUBLE) / CAST(v.nv AS DOUBLE)
       |                        - CAST(th.sx AS DOUBLE) / CAST(th.n AS DOUBLE))
       |                       / 100.0) AS mean_y_adj,
       |       th.theta
       |FROM v CROSS JOIN th ORDER BY v.variant""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.packedText]]. */
  def packedText(budget: Int, shards: Int, sep: String): String =
    s"""WITH $toksCte,
       |base AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |         ${h60("CAST(doc_id AS VARCHAR)")} % $shards AS shard,
       |         array_to_string(t, ' ') AS txt
       |  FROM toks),
       |cum AS (
       |  SELECT doc_id, shard, n_tokens, txt,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS UNBOUNDED PRECEDING) AS c
       |  FROM base)
       |SELECT shard, CAST((c - n_tokens) // $budget AS BIGINT) AS pack_id,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       |       string_agg(txt, '$sep' ORDER BY doc_id) AS pack_text
       |FROM (SELECT doc_id, shard, n_tokens, txt, c FROM cum)
       |GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin

  /** Mirrors [[graft.ext.TextAnalysis.repetitionSignals]]. */
  def repetitionSignals: String =
    s"""WITH $toksCte,
       |base AS (
       |  SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
       |         CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 1 END AS g_total,
       |         CASE WHEN len(t) >= 3
       |              THEN len(${Portable.shinglesSql("t", 3)}) ELSE 1 END AS g_distinct,
       |         t
       |  FROM toks),
       |tok AS (SELECT doc_id, unnest(t) AS w FROM base),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
       |topw AS (SELECT doc_id, max(c) AS top_c FROM wc GROUP BY 1)
       |SELECT b.doc_id, b.n_tokens,
       |       round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_word_frac,
       |       round(1.0 - CAST(g_distinct AS DOUBLE) / g_total, 6) AS dup_3gram_frac,
       |       round(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_word_frac
       |FROM base b JOIN topw USING (doc_id) ORDER BY doc_id""".stripMargin

  def langId: String =
    s"""WITH lex(lex_lang, t) AS (VALUES ${TextAnalysis.lexiconSqlValues}),
       |tok AS (
       |  SELECT doc_id, unnest(${Portable.tokensSql("text")}) AS t FROM documents),
       |hits AS (
       |  SELECT doc_id, lex_lang, count(*) AS hits
       |  FROM tok JOIN lex USING (t) GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, lex_lang AS detected_lang, hits
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY hits DESC, lex_lang) AS rn FROM hits)
       |  WHERE rn = 1)
       |SELECT d.doc_id, COALESCE(b.detected_lang, 'und') AS detected_lang,
       |       COALESCE(b.hits, 0) AS hits
       |FROM documents d LEFT JOIN best b USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.Profiling.cohenKappa]] applied to the lang tag
    * vs [[graft.ext.TextAnalysis.langId]]'s prediction: confusion-count
    * marginals, integer numerators, one final double division. */
  def kappaLangAgreement: String =
    s"""WITH lex(lex_lang, t) AS (VALUES ${TextAnalysis.lexiconSqlValues}),
       |tok AS (
       |  SELECT doc_id, unnest(${Portable.tokensSql("text")}) AS t FROM documents),
       |hits AS (
       |  SELECT doc_id, lex_lang, count(*) AS hits
       |  FROM tok JOIN lex USING (t) GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, lex_lang AS detected_lang
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY hits DESC, lex_lang) AS rn FROM hits)
       |  WHERE rn = 1),
       |pred AS (
       |  SELECT d.lang AS a, COALESCE(b.detected_lang, 'und') AS b
       |  FROM documents d LEFT JOIN best b USING (doc_id)),
       |conf AS (SELECT a, b, count(*) AS c FROM pred GROUP BY 1, 2),
       |tot AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM conf),
       |ma AS (SELECT a AS cat, sum(c) AS ca FROM conf GROUP BY 1),
       |mb AS (SELECT b AS cat, sum(c) AS cb FROM conf GROUP BY 1),
       |pe AS (
       |  SELECT CAST(COALESCE(sum(ca * cb), 0) AS BIGINT) AS pe_num
       |  FROM ma JOIN mb USING (cat))
       |SELECT n, n_agree,
       |       CASE WHEN n * n - pe_num > 0
       |            THEN round(CAST(n * n_agree - pe_num AS DOUBLE)
       |                       / (n * n - pe_num), 6) END AS kappa
       |FROM tot, pe""".stripMargin

  def qualityScore: String = {
    val stopList = TextAnalysis.qualityStopwords.map(w => s"'$w'").mkString(", ")
    val t = Portable.tokensSql("text")
    s"""WITH q AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len($t) AS n_tokens,
       |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
       |         len(list_filter($t, x -> x IN ($stopList))) AS n_stop
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_chars, n_tokens, n_alpha, n_stop,
       |         CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
       |         CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio
       |  FROM q)
       |SELECT doc_id, n_chars, n_tokens, n_alpha, n_stop, alpha_ratio, stop_ratio,
       |       round(0.5 * least(1.0, n_tokens / 64.0)
       |             + 0.25 * alpha_ratio
       |             + 0.25 * least(1.0, stop_ratio * 4.0), 6) AS quality_score
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Per-source Mann–Whitney AUC of the quality score predicting
    * lang = 'en' (mirrors [[graft.ext.Profiling.rankAuc]] over
    * [[graft.ext.TextAnalysis.qualityScore]]); the score CTEs are the
    * same expressions as [[qualityScore]], so the ranks cannot drift. */
  def rankAucQualityBySource: String = {
    val stopList = TextAnalysis.qualityStopwords.map(w => s"'$w'").mkString(", ")
    val t = Portable.tokensSql("text")
    s"""WITH q AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len($t) AS n_tokens,
       |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
       |         len(list_filter($t, x -> x IN ($stopList))) AS n_stop
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(n_alpha AS DOUBLE) / n_chars AS alpha_ratio,
       |         CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio
       |  FROM q),
       |sc AS (
       |  SELECT d.source,
       |         round(0.5 * least(1.0, r.n_tokens / 64.0)
       |               + 0.25 * alpha_ratio
       |               + 0.25 * least(1.0, stop_ratio * 4.0), 6) AS score,
       |         d.lang = 'en' AS pos
       |  FROM r JOIN documents d USING (doc_id)),
       |rk AS (
       |  SELECT source, pos,
       |         rank() OVER (PARTITION BY source ORDER BY score) AS rmin,
       |         count(*) OVER (PARTITION BY source, score) AS cnt
       |  FROM sc),
       |ag AS (
       |  SELECT source,
       |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |         CAST(count(*) - sum(CASE WHEN pos THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_neg,
       |         CAST(sum(CASE WHEN pos THEN 2 * rmin + cnt - 1 ELSE 0 END)
       |              AS BIGINT) AS s2
       |  FROM rk GROUP BY 1)
       |SELECT source, n_pos, n_neg,
       |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |            ELSE CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
       |                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |       END AS auc
       |FROM ag ORDER BY source""".stripMargin
  }

  def tokenCounts: String =
    s"""SELECT doc_id,
       |       len(${Portable.tokensSql("text")}) AS n_ws_tokens,
       |       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
       |       len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9 ]'))
       |         AS n_subword_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  def fingerprint: String =
    s"""WITH $toksCte,
       |sharr AS (SELECT doc_id, $shinglesExpr AS sh FROM toks)
       |SELECT t.doc_id, md5(d.text) AS content_md5,
       |       list_min(list_transform(t.sh, s -> ${h60("s")})) AS shingle_fp
       |FROM sharr t JOIN documents d ON t.doc_id = d.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Near-dup clusters (mirrors [[graft.ext.Clusters.nearDupClusters]]):
    * LSH-verified pairs at `minJaccard`, closed transitively with a
    * recursive CTE (cluster id = min reachable id; UNION-distinct
    * fixpoint ≡ the Spark side's min-label-propagation fixpoint). */
  def dupClusters(minJaccard: Double): String =
    s"""WITH RECURSIVE $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |verified AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sharr a ON pairs.id_a = a.doc_id
       |  JOIN sharr b ON pairs.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= $minJaccard),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION
       |  SELECT id_b, id_a FROM verified),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.id),
       |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1)
       |SELECT cc.id AS doc_id, cc.cluster_id, sizes.cluster_size,
       |       cc.id = cc.cluster_id AS is_canonical
       |FROM cc JOIN sizes USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** Mirrors [[graft.ext.Clusters.clusterSizeHistogram]]: the
    * [[dupClusters]] CC chain reduced to a size histogram, with the
    * singleton (unclustered) row reconciling to the corpus. */
  def clusterSizeHistogram(minJaccard: Double): String =
    s"""WITH RECURSIVE $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |verified AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sharr a ON pairs.id_a = a.doc_id
       |  JOIN sharr b ON pairs.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= $minJaccard),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION
       |  SELECT id_b, id_a FROM verified),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.id),
       |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1),
       |hst AS (
       |  SELECT cluster_size, count(*) AS n_clusters,
       |         CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |  FROM sizes GROUP BY 1),
       |tot AS (SELECT count(*) AS n_total FROM documents),
       |inn AS (SELECT CAST(COALESCE(sum(n_docs), 0) AS BIGINT) AS n_in
       |        FROM hst),
       |uni AS (
       |  SELECT cluster_size, n_clusters, n_docs FROM hst
       |  UNION ALL
       |  SELECT 1, tot.n_total - inn.n_in, tot.n_total - inn.n_in
       |  FROM tot, inn WHERE tot.n_total > inn.n_in)
       |SELECT u.cluster_size, u.n_clusters, u.n_docs,
       |       round(CAST(u.n_docs AS DOUBLE) / tot.n_total, 6) AS doc_share
       |FROM uni u CROSS JOIN tot
       |ORDER BY cluster_size""".stripMargin

  /** Fixed-iteration integer-unit PageRank over the LSH-verified
    * near-dup graph (mirrors [[graft.ext.Clusters.pageRank]] fed by
    * `lshVerifiedPairs`): the recurrence unrolls to `iterations` chained
    * CTEs, all arithmetic in BIGINT floor-division (`//`), so the ranks
    * are bit-exact across engines. */
  def pageRank(minJaccard: Double, iterations: Int): String = {
    val scale = 1000000000L
    val teleport = s"${15 * scale} // (100 * nn.n)" // pre-folded: 15·SCALE overflows INT32
    val its = (1 to iterations).map { i =>
      val prev = if (i == 1) "r0" else s"it${i - 1}"
      s"""it$i AS (
         |  SELECT d.doc_id AS id, $teleport + COALESCE(c.s, 0) AS units
         |  FROM documents d CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst, CAST(sum((85 * r.units) // (100 * g.deg)) AS BIGINT) AS s
         |    FROM edges e JOIN $prev r ON e.src = r.id JOIN deg g ON g.src = e.src
         |    GROUP BY 1) c ON c.dst = d.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |verified AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sharr a ON pairs.id_a = a.doc_id
       |  JOIN sharr b ON pairs.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= $minJaccard),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION
       |  SELECT id_b, id_a FROM verified),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM documents),
       |r0 AS (
       |  SELECT doc_id AS id, $scale // nn.n AS units
       |  FROM documents CROSS JOIN nn),
       |$its
       |SELECT it$iterations.id AS doc_id,
       |       COALESCE(deg.deg, 0) AS degree,
       |       it$iterations.units AS rank_units,
       |       it$iterations.units / 1e9 AS pagerank
       |FROM it$iterations LEFT JOIN deg ON deg.src = it$iterations.id
       |ORDER BY doc_id""".stripMargin
  }

  /** Z-order cell stats over orders (mirrors
    * [[graft.ext.Layout.zorderStats]] on `o_custkey % 2^bits` ×
    * `epoch-day % 2^bits`): the Morton interleave spelled out as SQL
    * bit ops — bit-exact across engines. */
  def zorderStats(bits: Int, prefixBits: Int): String = {
    val mask = (1L << bits) - 1
    val interleave = (0 until bits).map { i =>
      s"((((a >> $i) & 1) << ${2 * i + 1}) | (((b >> $i) & 1) << ${2 * i}))"
    }.mkString(" | ")
    s"""WITH src AS (
       |  SELECT o_custkey % ${mask + 1} AS a,
       |         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % ${mask + 1} AS b
       |  FROM orders),
       |zz AS (SELECT a, b, $interleave AS z FROM src)
       |SELECT z >> ${2 * bits - prefixBits} AS z_cell,
       |       count(*) AS n_rows,
       |       min(a) AS min_a, max(a) AS max_a,
       |       min(b) AS min_b, max(b) AS max_b,
       |       min(z) AS min_z, max(z) AS max_z
       |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Weekly cohort retention (mirrors
    * [[graft.ext.Behavior.retentionWeekly]]). */
  def retentionWeekly: String =
    s"""WITH wk AS (
       |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
       |  FROM events),
       |coh AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
       |SELECT cohort_week,
       |       CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
       |       count(DISTINCT user_id) AS n_users
       |FROM wk JOIN coh USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Ordered signup→view→purchase funnel (mirrors
    * [[graft.ext.Behavior.funnel]]). */
  def funnel: String =
    s"""WITH s1 AS (
       |  SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (
       |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       |  WHERE e.event_type = 'view' AND e.ts > t1 GROUP BY 1),
       |s3 AS (
       |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.ts > t2 GROUP BY 1)
       |SELECT s1.user_id, t1 AS signup_ts, t2 AS view_ts, t3 AS purchase_ts,
       |       CASE WHEN t3 IS NOT NULL THEN 3
       |            WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage_reached
       |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
       |ORDER BY user_id""".stripMargin

  /** Deterministic train/val/test hash split (mirrors
    * [[graft.ext.Sampling.hashSplit]]). */
  def hashSplit(trainPct: Int, valPct: Int, salt: String): String = {
    val bucket = graft.ext.Sampling.hashBucketSql("doc_id", salt)
    s"""WITH b AS (SELECT doc_id, lang, $bucket AS bucket FROM documents)
       |SELECT doc_id, lang, bucket,
       |       CASE WHEN bucket < $trainPct THEN 'train'
       |            WHEN bucket < ${trainPct + valPct} THEN 'val'
       |            ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Exact-size per-stratum deterministic sample (mirrors
    * [[graft.ext.Sampling.stratifiedSample]]). */
  def stratifiedSample(k: Int, salt: String): String = {
    val h = Portable.h60Sql(s"'$salt:' || CAST(doc_id AS VARCHAR)")
    s"""WITH r AS (
       |  SELECT source, doc_id,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY $h, doc_id) AS sample_rank
       |  FROM documents)
       |SELECT source, doc_id, sample_rank FROM r
       |WHERE sample_rank <= $k ORDER BY source, doc_id""".stripMargin
  }

  /** Int8 quantization quality report (mirrors
    * [[graft.ext.Similarity.quantizeInt8Report]]): same op-for-op double
    * formulas; the mean sums integral 1e-9-unit errors so float
    * summation order cannot differ between engines. */
  def quantizeInt8: String =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |s AS (
       |  SELECT vec_id, emb,
       |         greatest(list_max(list_transform(emb, x -> abs(x))), 1e-12)
       |           / 127.0 AS q_scale
       |  FROM v),
       |e AS (
       |  SELECT vec_id, q_scale,
       |         list_transform(emb, x ->
       |           CAST(round(abs(round(x / q_scale) * q_scale - x) * 1e9)
       |                AS BIGINT)) AS err_nanos
       |  FROM s)
       |SELECT vec_id, q_scale,
       |       (CAST(list_sum(err_nanos) AS DOUBLE) / len(err_nanos)) / 1e9
       |         AS mean_abs_err,
       |       list_max(err_nanos) / 1e9 AS max_abs_err
       |FROM e ORDER BY vec_id""".stripMargin

  /** Per-doc top TF-IDF terms (mirrors
    * [[graft.ext.TextAnalysis.tfidfTopTerms]]); ranking compares the
    * ROUNDED score (ties → term) on both engines. */
  def tfidfTopTerms(topPerDoc: Int): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Portable.tokensSql("text")}) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dfv AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |sc AS (
       |  SELECT doc_id, term, tf, df,
       |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
       |  FROM tf JOIN dfv USING (term) CROSS JOIN n),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |           ORDER BY tfidf DESC, term) AS term_rank
       |  FROM sc)
       |SELECT doc_id, term_rank, term, tf, df, tfidf FROM rk
       |WHERE term_rank <= $topPerDoc ORDER BY doc_id, term_rank""".stripMargin

  /** Mirrors [[graft.ext.Retrieval.bm25Search]]: identical literal
    * parenthesization (constants interpolated from the same Scala
    * doubles), per-term scores quantized to 1e-9 units before the
    * order-free integer sum, rounded-score ranking with doc-id ties. */
  def bm25Search(queryModEvery: Int, k: Int,
                 k1: Double = 1.2, b: Double = 0.75,
                 maxDfFraction: Double = 0.5): String =
    s"""WITH ${bm25Ctes(queryModEvery, k1, b, maxDfFraction)}
       |SELECT query_id, doc_id, bm25, rank FROM rk
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** The BM25 CTE chain shared by [[bm25Search]], [[bm25Truncated]]
    * and [[rrfFusion]]: yields `rk` = (query_id, doc_id, bm25, rank).
    * `maxPostingsPerTerm` > 0 mirrors the two-stage
    * [[graft.ext.Retrieval.bm25TruncatedFromPostings]] — candidates
    * from each term's top-M postings by (tn desc, doc_id asc), then
    * EXACT rescoring of candidates against the full index; the query
    * side always draws its term lists from the full tf. */
  private def bm25Ctes(queryModEvery: Int, k1: Double, b: Double,
                       maxDfFraction: Double,
                       maxPostingsPerTerm: Int = 0): String = {
    val hitCte =
      if (maxPostingsPerTerm > 0)
        s"""tr AS (
           |  SELECT doc_id, term, tn FROM (
           |    SELECT doc_id, term, tn,
           |           row_number() OVER (PARTITION BY term
           |             ORDER BY tn DESC, doc_id ASC) AS pr
           |    FROM ts) WHERE pr <= $maxPostingsPerTerm),
           |cand AS (
           |  SELECT DISTINCT q.query_id, t.doc_id
           |  FROM tr t JOIN qt q USING (term)
           |  WHERE t.doc_id <> q.query_id),
           |hit AS (
           |  SELECT c.query_id, c.doc_id,
           |         CAST((CAST(sum(t.tn) AS BIGINT) + 500) // 1000 AS DOUBLE)
           |           / 1000000.0 AS bm25
           |  FROM cand c
           |  JOIN ts t ON t.doc_id = c.doc_id
           |  JOIN qt q ON q.query_id = c.query_id AND q.term = t.term
           |  GROUP BY 1, 2)""".stripMargin
      else
        s"""hit AS (
           |  SELECT q.query_id, t.doc_id,
           |         CAST((CAST(sum(t.tn) AS BIGINT) + 500) // 1000 AS DOUBLE)
           |           / 1000000.0 AS bm25
           |  FROM ts t JOIN qt q USING (term)
           |  WHERE t.doc_id <> q.query_id GROUP BY 1, 2)""".stripMargin
    s"""tok AS (
       |  SELECT doc_id, unnest(${Portable.tokensSql("text")}) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
       |dfv AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
       |sc AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len
       |       FROM dl),
       |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
       |       WHERE doc_id % $queryModEvery = 0),
       |ts AS (
       |  SELECT f.doc_id, f.term,
       |         CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
       |                    * ((f.tf * ${k1 + 1}) /
       |                       (f.tf + $k1 * (${1.0 - b} + $b *
       |                          ((CAST(l.len AS DOUBLE) * n_docs) / sum_len))))
       |                    * 1e9) AS BIGINT) AS tn
       |  FROM tf f JOIN dfv USING (term) JOIN dl l ON l.doc_id = f.doc_id
       |  CROSS JOIN sc
       |  WHERE df <= n_docs * $maxDfFraction),
       |$hitCte,
       |rk AS (
       |  SELECT query_id, doc_id, bm25,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY bm25 DESC, doc_id) AS rank
       |  FROM hit)""".stripMargin
  }

  /** Mirrors [[graft.ext.Retrieval.bm25TruncatedFromPostings]] at the
    * engine defaults (k1=1.2, b=0.75, no df cap): the impact-truncated
    * probe — q341, the q128 spec's scale-safe sibling. */
  def bm25Truncated(queryModEvery: Int, k: Int,
                    maxPostingsPerTerm: Int): String =
    s"""WITH ${bm25Ctes(queryModEvery, 1.2, 0.75, 1.0, maxPostingsPerTerm)}
       |SELECT query_id, doc_id, bm25, rank FROM rk
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Retrieval.truncationRecallSweep]]: the exact
    * uncapped chain from [[bm25Ctes]] (its `rk` IS the exact probe),
    * then per M a suffixed truncated chain — term-wise top-M candidates,
    * exact rescore, top-k — intersected with the exact top-k; recall is
    * the half-up micro ratio hits∕n_exact. CTEs in one WITH list see
    * their predecessors, so every arm reuses the shared base (tok…ts,
    * qt) without re-deriving it. */
  def bm25TruncationSweep(queryModEvery: Int, k: Int,
                          mList: Seq[Int]): String = {
    val armCtes = mList.map { m =>
      s"""tr_$m AS (
         |  SELECT doc_id, term, tn FROM (
         |    SELECT doc_id, term, tn,
         |           row_number() OVER (PARTITION BY term
         |             ORDER BY tn DESC, doc_id ASC) AS pr
         |    FROM ts) WHERE pr <= $m),
         |cand_$m AS (
         |  SELECT DISTINCT q.query_id, t.doc_id
         |  FROM tr_$m t JOIN qt q USING (term)
         |  WHERE t.doc_id <> q.query_id),
         |hit_$m AS (
         |  SELECT c.query_id, c.doc_id,
         |         CAST((CAST(sum(t.tn) AS BIGINT) + 500) // 1000 AS DOUBLE)
         |           / 1000000.0 AS bm25
         |  FROM cand_$m c
         |  JOIN ts t ON t.doc_id = c.doc_id
         |  JOIN qt q ON q.query_id = c.query_id AND q.term = t.term
         |  GROUP BY 1, 2),
         |rk_$m AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM hit_$m),
         |app_$m AS (SELECT query_id, doc_id FROM rk_$m WHERE rank <= $k),
         |h_$m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS hits
         |  FROM ex e JOIN app_$m a
         |    ON e.query_id = a.query_id AND e.doc_id = a.doc_id)""".stripMargin
    }.mkString(",\n")
    val armSelects = mList.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS max_postings, tot.n_queries,
         |       tot.n_exact, h_$m.hits,
         |       (((h_$m.hits * 1000000 * 2) + tot.n_exact)
         |         // (tot.n_exact * 2)) / 1000000.0 AS recall
         |FROM h_$m CROSS JOIN tot""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bm25Ctes(queryModEvery, 1.2, 0.75, 1.0)},
       |ex AS (SELECT query_id, doc_id FROM rk WHERE rank <= $k),
       |tot AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       |               CAST(count(*) AS BIGINT) AS n_exact FROM ex),
       |$armCtes
       |$armSelects
       |ORDER BY max_postings""".stripMargin
  }

  /** Mirrors [[graft.ext.Retrieval.rrfFuse]] over the gated hybrid:
    * uncapped BM25 top-kLex fused with the dense all-pairs top-kDen
    * ([[topKNeighbors]] restricted to the query anchors).
    * `maxPostingsPerTerm` > 0 swaps in the impact-truncated lexical
    * side — the q342 scale-safe hybrid. */
  def rrfFusion(queryModEvery: Int, kLex: Int, kDen: Int,
                c: Int, k: Int, maxPostingsPerTerm: Int = 0): String =
    s"""WITH ${bm25Ctes(queryModEvery, 1.2, 0.75, 1.0, maxPostingsPerTerm)},
       |bmr AS (SELECT query_id, doc_id, rank FROM rk WHERE rank <= $kLex),
       |ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |       FROM embeddings),
       |dcj AS (
       |  SELECT a.vec_id AS query_id, b2.vec_id AS doc_id,
       |         round(list_cosine_similarity(a.emb, b2.emb), 6) AS cosine
       |  FROM ve a JOIN ve b2
       |    ON a.vec_id % $queryModEvery = 0 AND a.vec_id != b2.vec_id),
       |drk AS (
       |  SELECT query_id, doc_id,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, doc_id) AS rank
       |  FROM dcj),
       |dtop AS (SELECT query_id, doc_id, rank FROM drk WHERE rank <= $kDen),
       |uni AS (SELECT * FROM bmr UNION ALL SELECT * FROM dtop),
       |fs AS (
       |  SELECT query_id, doc_id,
       |         CAST(sum(CAST(round(1e9 / ($c + rank)) AS BIGINT)) AS BIGINT)
       |           AS su
       |  FROM uni GROUP BY 1, 2),
       |fr AS (
       |  SELECT query_id, doc_id, CAST(su AS DOUBLE) / 1e9 AS rrf,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY CAST(su AS DOUBLE) / 1e9 DESC, doc_id) AS rank
       |  FROM fs)
       |SELECT query_id, doc_id, rrf, rank FROM fr
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Mirrors [[graft.ext.Drift.jsdPerGroup]] over (source, text) of the
    * documents table. */
  def jsdPerGroup(): String =
    s"""WITH tok AS (
       |  SELECT source AS g, unnest(${Portable.tokensSql("text")}) AS term
       |  FROM documents),
       |cst AS (SELECT g, term, count(*) AS cst FROM tok GROUP BY 1, 2),
       |ct AS (SELECT term, CAST(sum(cst) AS BIGINT) AS ct FROM cst GROUP BY 1),
       |ns AS (SELECT g, CAST(sum(cst) AS BIGINT) AS ns FROM cst GROUP BY 1),
       |t AS (SELECT CAST(sum(cst) AS BIGINT) AS n FROM cst),
       |fl AS (
       |  SELECT ns.g, ns.ns, ct.term, ct.ct, t.n, COALESCE(c.cst, 0) AS cst
       |  FROM ns CROSS JOIN ct CROSS JOIN t
       |  LEFT JOIN cst c ON c.g = ns.g AND c.term = ct.term),
       |u AS (
       |  SELECT g, ns,
       |         CAST(round((CASE WHEN cst > 0
       |                THEN (CAST(cst AS DOUBLE) / ns)
       |                     * ln((CAST(cst AS DOUBLE) / ns)
       |                          / ((CAST(cst AS DOUBLE) / ns
       |                              + CAST(ct AS DOUBLE) / n) / 2.0))
       |                ELSE 0.0 END
       |              + (CAST(ct AS DOUBLE) / n)
       |                * ln((CAST(ct AS DOUBLE) / n)
       |                     / ((CAST(cst AS DOUBLE) / ns
       |                         + CAST(ct AS DOUBLE) / n) / 2.0)))
       |             * 0.5 * 1e9) AS BIGINT) AS u
       |  FROM fl)
       |SELECT g AS source, ns AS n_tokens,
       |       CAST(CAST(sum(u) AS BIGINT) AS DOUBLE) / 1e9 AS jsd_nats
       |FROM u GROUP BY 1, 2 ORDER BY source""".stripMargin

  /** Mirrors [[graft.ext.Profiling.mutualInformation]] over
    * (source, lang) of the documents table. */
  def mutualInformation(): String =
    s"""WITH j AS (
       |  SELECT CAST(source AS VARCHAR) AS a, CAST(lang AS VARCHAR) AS b,
       |         count(*) AS nab
       |  FROM documents GROUP BY 1, 2),
       |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM j GROUP BY 1),
       |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM j GROUP BY 1),
       |t AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM j),
       |mi AS (
       |  SELECT CAST(sum(CAST(round((CAST(nab AS DOUBLE) / n)
       |           * ln((CAST(n AS DOUBLE) * nab) / (CAST(na AS DOUBLE) * nb))
       |           * 1e9) AS BIGINT)) AS BIGINT) AS u
       |  FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN t),
       |ha AS (
       |  SELECT CAST(sum(CAST(round(-(CAST(na AS DOUBLE) / n)
       |           * ln(CAST(na AS DOUBLE) / n) * 1e9) AS BIGINT)) AS BIGINT) AS u
       |  FROM ma CROSS JOIN t),
       |hb AS (
       |  SELECT CAST(sum(CAST(round(-(CAST(nb AS DOUBLE) / n)
       |           * ln(CAST(nb AS DOUBLE) / n) * 1e9) AS BIGINT)) AS BIGINT) AS u
       |  FROM mb CROSS JOIN t)
       |SELECT n, CAST(mi.u AS DOUBLE) / 1e9 AS mi_nats,
       |       CAST(ha.u AS DOUBLE) / 1e9 AS h_a,
       |       CAST(hb.u AS DOUBLE) / 1e9 AS h_b
       |FROM t CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb""".stripMargin

  /** Composed curation pipeline (mirrors [[graft.ext.Curation.curate]]):
    * quality gate + language gate + near-dup-loser anti-join + hash
    * split, each stage the same SQL as its standalone oracle. */
  /** Shared curation lineage: LSH→CC dup losers, lexicon language
    * votes, and the rounded quality score — everything both
    * [[curatedCorpus]] and [[dropReasonManifest]] filter on. Ends with
    * `losers(doc_id)`, `langv(doc_id, detected_lang)`,
    * `q(doc_id, quality_score)`. */
  private def curationCtes(minJaccard: Double): String = {
    val stopList = graft.ext.TextAnalysis.qualityStopwords.map(w => s"'$w'").mkString(", ")
    val t = Portable.tokensSql("text")
    s"""$toksCte,
       |$sigCte,
       |$bandsCte,
       |sharr AS (
       |  SELECT doc_id, $shinglesExpr AS sh FROM toks),
       |verified AS (
       |  SELECT id_a, id_b
       |  FROM pairs
       |  JOIN sharr a ON pairs.id_a = a.doc_id
       |  JOIN sharr b ON pairs.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= $minJaccard),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION
       |  SELECT id_b, id_a FROM verified),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, rr.r FROM reach rr JOIN edges e ON e.src = rr.id),
       |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |losers AS (SELECT id AS doc_id FROM cc WHERE id != cluster_id),
       |lex(lex_lang, t) AS (VALUES ${graft.ext.TextAnalysis.lexiconSqlValues}),
       |ltok AS (
       |  SELECT doc_id, unnest($t) AS t FROM documents),
       |hits AS (
       |  SELECT doc_id, lex_lang, count(*) AS hits
       |  FROM ltok JOIN lex USING (t) GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, lex_lang AS detected_lang
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |          ORDER BY hits DESC, lex_lang) AS rn FROM hits)
       |  WHERE rn = 1),
       |langv AS (
       |  SELECT d.doc_id, COALESCE(b.detected_lang, 'und') AS detected_lang
       |  FROM documents d LEFT JOIN best b USING (doc_id)),
       |q0 AS (
       |  SELECT doc_id,
       |         length(text) AS n_chars,
       |         len($t) AS n_tokens,
       |         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
       |         len(list_filter($t, x -> x IN ($stopList))) AS n_stop
       |  FROM documents),
       |q AS (
       |  SELECT doc_id,
       |         round(0.5 * least(1.0, n_tokens / 64.0)
       |               + 0.25 * (CAST(n_alpha AS DOUBLE) / n_chars)
       |               + 0.25 * least(1.0, (CAST(n_stop AS DOUBLE) / n_tokens) * 4.0),
       |               6) AS quality_score
       |  FROM q0)""".stripMargin
  }

  def curatedCorpus(minQuality: Double, lang: String, minJaccard: Double): String = {
    val bucket = graft.ext.Sampling.hashBucketSql("doc_id", "split")
    s"""WITH RECURSIVE ${curationCtes(minJaccard)},
       |cur AS (
       |  SELECT d.doc_id, l.detected_lang, q.quality_score
       |  FROM documents d
       |  JOIN q USING (doc_id)
       |  JOIN langv l USING (doc_id)
       |  WHERE q.quality_score >= $minQuality AND l.detected_lang = '$lang'
       |    AND d.doc_id NOT IN (SELECT doc_id FROM losers)),
       |bk AS (
       |  SELECT doc_id, detected_lang, quality_score, $bucket AS bucket FROM cur)
       |SELECT doc_id, detected_lang, quality_score, bucket,
       |       CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM bk ORDER BY doc_id""".stripMargin
  }

  /** Mirrors [[graft.ext.Curation.dropReasonManifest]]: first-failing
    * disposition per doc under the same rule order, rolled up per
    * source with within-source shares. */
  def dropReasonManifest(minQuality: Double, lang: String, minJaccard: Double): String =
    s"""WITH RECURSIVE ${curationCtes(minJaccard)},
       |disp AS (
       |  SELECT d.source,
       |         CASE WHEN q.quality_score IS NULL
       |                OR q.quality_score < $minQuality THEN 'low_quality'
       |              WHEN l.detected_lang <> '$lang' THEN 'wrong_lang'
       |              WHEN d.doc_id IN (SELECT doc_id FROM losers)
       |                THEN 'near_dup'
       |              ELSE 'kept' END AS disposition
       |  FROM documents d
       |  JOIN q USING (doc_id)
       |  JOIN langv l USING (doc_id)),
       |dra AS (
       |  SELECT source, disposition, count(*) AS n_docs
       |  FROM disp GROUP BY 1, 2)
       |SELECT source, disposition, n_docs,
       |       round(CAST(n_docs AS DOUBLE)
       |             / sum(n_docs) OVER (PARTITION BY source), 6)
       |         AS source_share
       |FROM dra ORDER BY source, disposition""".stripMargin

  /** Per-column profile of lineitem (mirrors
    * [[graft.ext.Profiling.summarize]]): one UNION ALL branch per
    * column, numeric stats through exact integral 1e-4 units (sums as
    * BIGINT — double summation of id-scale columns would pass 2^53 and
    * go order-dependent). */
  def profileLineitem(cols: Seq[(String, String)]): String = {
    val branches = cols.map { case (name, kind) =>
      val (minN, maxN, sumN) =
        if (kind == "num")
          (s"min(round(CAST($name AS DOUBLE) * 10000)) / 10000.0",
           s"max(round(CAST($name AS DOUBLE) * 10000)) / 10000.0",
           s"sum(CAST(round(CAST($name AS DOUBLE) * 10000) AS BIGINT)) / 10000.0")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (minS, maxS) =
        if (kind == "str") (s"min($name)", s"max($name)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$name' AS column_name, count(*) AS n_rows,
         |       count(*) - count($name) AS n_nulls,
         |       count(DISTINCT $name) AS n_distinct,
         |       $minN AS min_num, $maxN AS max_num, $sumN AS sum_num,
         |       $minS AS min_str, $maxS AS max_str
         |FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** First-order event-type transition matrix (mirrors
    * [[graft.ext.Behavior.transitions]]). */
  def transitions: String =
    s"""WITH s AS (
       |  SELECT user_id, event_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id) AS next_type
       |  FROM events),
       |c AS (
       |  SELECT event_type AS from_type, next_type AS to_type,
       |         count(*) AS n_transitions
       |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n_transitions,
       |       round(n_transitions
       |             / sum(n_transitions) OVER (PARTITION BY from_type), 6)
       |         AS p_transition
       |FROM c ORDER BY from_type, to_type""".stripMargin

  /** Daily-revenue z-score outliers (mirrors
    * [[graft.ext.Anomaly.revenueOutliers]]): daily totals as exact LONG
    * 1e-4 units, variance moments over whole-dollar integers derived from
    * them (Σd² over 1e-4 units would overflow BIGINT at TPC-H magnitude),
    * then one fixed double formula — mirrored op-for-op so even sqrt
    * agrees bit-for-bit. */
  def revenueOutliers(minZ: Double, minDays: Int): String =
    OracleSql.withBase(
      s"""an_daily AS (
         |  SELECT restaurant_id, creation_date,
         |         sum(CAST(round(total_revenue * 10000) AS BIGINT)) AS cents,
         |         CAST(round(sum(CAST(round(total_revenue * 10000) AS BIGINT))
         |                    / 10000.0) AS BIGINT) AS dd
         |  FROM order_revenue GROUP BY 1, 2),
         |an_m AS (
         |  SELECT restaurant_id, count(*) AS n_days,
         |         sum(dd) AS sx, sum(dd * dd) AS sxx
         |  FROM an_daily GROUP BY 1 HAVING count(*) >= $minDays),
         |an_z AS (
         |  SELECT d.restaurant_id, d.creation_date, d.cents, d.dd,
         |         CAST(m.sx AS DOUBLE) / m.n_days AS mean_d,
         |         (CAST(m.sxx AS DOUBLE)
         |            - CAST(m.sx AS DOUBLE) * m.sx / m.n_days) / m.n_days
         |           AS var_d
         |  FROM an_daily d JOIN an_m m USING (restaurant_id))""".stripMargin,
      s"""SELECT restaurant_id, creation_date,
         |       cents / 10000.0 AS daily_revenue,
         |       mean_d AS mean_revenue,
         |       round((dd - mean_d) / sqrt(var_d), 6) AS z_score
         |FROM an_z
         |WHERE var_d > 0
         |  AND abs((dd - mean_d) / sqrt(var_d)) >= $minZ
         |ORDER BY restaurant_id, creation_date""".stripMargin)

  /** PII scrub counts + redacted-text md5 (mirrors
    * [[graft.ext.TextAnalysis.piiScrub]]). DuckDB regexp_replace needs
    * the 'g' flag to match Spark's replace-all. */
  def piiScrub: String = {
    val email = graft.ext.TextAnalysis.EmailPat
    val url = graft.ext.TextAnalysis.UrlPat
    val num = graft.ext.TextAnalysis.LongNumPat
    s"""SELECT doc_id,
       |       len(regexp_extract_all(text, '$email')) AS n_emails,
       |       len(regexp_extract_all(text, '$url')) AS n_urls,
       |       len(regexp_extract_all(text, '$num')) AS n_longnums,
       |       md5(regexp_replace(regexp_replace(regexp_replace(
       |             text, '$email', '<EMAIL>', 'g'),
       |             '$url', '<URL>', 'g'),
       |             '$num', '<NUM>', 'g')) AS redacted_md5
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Mirrors [[graft.ext.TextAnalysis.bigramLmScore]]: add-one-smoothed
    * bigram LM with CONTEXT-count denominators, per-(w1,w2) log-probs
    * quantized once to 1e-9-nat units, order-free per-doc sums. */
  def bigramLmScore: String =
    s"""WITH $toksCte,
       |blg AS (
       |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
       |bltf AS (
       |  SELECT doc_id, w1, w2, count(*) AS tf FROM blg GROUP BY 1, 2, 3),
       |blm AS (SELECT w1, w2, count(*) AS c12 FROM blg GROUP BY 1, 2),
       |blc AS (SELECT w1, count(*) AS c1 FROM blg GROUP BY 1),
       |blv AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(t) AS w FROM toks)),
       |blu AS (
       |  SELECT tf.doc_id,
       |         tf.tf,
       |         tf.tf * CAST(round(ln(CAST(m.c12 + 1 AS DOUBLE)
       |                               / (c.c1 + blv.v)) * 1e9) AS BIGINT)
       |           AS units
       |  FROM bltf tf
       |  JOIN blm m USING (w1, w2)
       |  JOIN blc c USING (w1)
       |  CROSS JOIN blv),
       |bls AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |         CAST(sum(units) AS BIGINT) AS su
       |  FROM blu GROUP BY 1)
       |SELECT doc_id, n_bigrams,
       |       round((su / 1e9) / n_bigrams, 6) AS avg_logprob
       |FROM bls ORDER BY doc_id""".stripMargin

  /** Shared CTE chain for the PCA power iteration (mirrors
    * [[graft.ext.Profiling.powerIterate]]): the q161 covariance CTEs,
    * the mirrored full matrix, and `iterations` UNROLLED matvec +
    * normalize steps (the q77 PageRank unrolling, lifted to doubles) —
    * matvec terms quantized to 1e-6 units so every sum is an order-free
    * integer, norms from exact Σwu² longs, divides/sqrts fixed IEEE
    * two-operand chains. Ends with `v{iterations}(i, vd)`. */
  private def pcaCtes(dim: Int, iterations: Int): String = {
    val its = (1 to iterations).map { k =>
      val prev = if (k == 1) "pv0" else s"pv${k - 1}"
      s"""pw$k AS MATERIALIZED (
         |  SELECT c.i,
         |         CAST(sum(CAST(round(c.cov * v.vd * 1000000.0) AS BIGINT))
         |           AS BIGINT) AS wu
         |  FROM pcm c JOIN $prev v ON c.j = v.i GROUP BY 1),
         |pn$k AS (SELECT sqrt(CAST(sum(wu * wu) AS DOUBLE)) AS nrm FROM pw$k),
         |pv$k AS MATERIALIZED (
         |  SELECT i, wu / nrm AS vd FROM pw$k CROSS JOIN pn$k)""".stripMargin
    }.mkString(",\n")
    s"""pcq AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> CAST(round(x * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |pcd AS (SELECT range AS i FROM range($dim)),
       |pcp AS (
       |  SELECT di.i, dj.i AS j,
       |         CAST(sum(qv[di.i + 1] * qv[dj.i + 1]) AS BIGINT) AS spp
       |  FROM pcq, pcd di, pcd dj WHERE dj.i >= di.i GROUP BY 1, 2),
       |pcs AS (
       |  SELECT pcd.i, CAST(sum(qv[pcd.i + 1]) AS BIGINT) AS sd
       |  FROM pcq, pcd GROUP BY 1),
       |pcn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM pcq),
       |pcu AS (
       |  SELECT pcp.i, pcp.j,
       |         (CAST(pcp.spp AS DOUBLE) / CAST(pcn.n_rows AS DOUBLE)
       |          - (CAST(si.sd AS DOUBLE) / CAST(pcn.n_rows AS DOUBLE))
       |            * (CAST(sj.sd AS DOUBLE) / CAST(pcn.n_rows AS DOUBLE)))
       |         / 1000000.0 AS cov
       |  FROM pcp JOIN pcs si ON si.i = pcp.i JOIN pcs sj ON sj.i = pcp.j
       |  CROSS JOIN pcn),
       |pcm AS MATERIALIZED (
       |        SELECT i, j, cov FROM pcu
       |        UNION ALL
       |        SELECT j, i, cov FROM pcu WHERE i <> j),
       |pv0 AS (SELECT i, 1.0 / sqrt(CAST($dim AS DOUBLE)) AS vd FROM pcd),
       |$its""".stripMargin
  }

  /** Mirrors [[graft.ext.Profiling.pcaLoadings]]. */
  def pcaLoadings(dim: Int = 64, iterations: Int = 12): String = {
    val vf = s"pv$iterations"
    s"""WITH ${pcaCtes(dim, iterations)},
       |pwf AS (
       |  SELECT c.i,
       |         CAST(sum(CAST(round(c.cov * v.vd * 1000000.0) AS BIGINT))
       |           AS BIGINT) AS wu
       |  FROM pcm c JOIN $vf v ON c.j = v.i GROUP BY 1),
       |plam AS (
       |  SELECT CAST(sum(CAST(round(v.vd * w.wu) AS BIGINT)) AS BIGINT) AS lu
       |  FROM $vf v JOIN pwf w ON w.i = v.i),
       |ptr AS (
       |  SELECT CAST(sum(CAST(round(cov * 1e9) AS BIGINT)) AS BIGINT) AS tu
       |  FROM pcm WHERE i = j)
       |SELECT CAST(v.i AS BIGINT) AS dim_idx,
       |       round(v.vd, 6) AS loading,
       |       round(lu / 1e6, 6) AS eigenvalue,
       |       round((lu / 1e6) / (tu / 1e9), 6) AS explained_share
       |FROM $vf v CROSS JOIN plam CROSS JOIN ptr
       |ORDER BY dim_idx""".stripMargin
  }

  /** Mirrors [[graft.ext.Profiling.pcaProjection]]. */
  def pcaProjection(dim: Int = 64, iterations: Int = 12): String = {
    val vf = s"pv$iterations"
    s"""WITH ${pcaCtes(dim, iterations)},
       |ppj AS (
       |  SELECT q.vec_id,
       |         CAST(sum(CAST(round(q.qv[v.i + 1] * v.vd) AS BIGINT))
       |           AS BIGINT) AS units
       |  FROM pcq q, $vf v GROUP BY 1)
       |SELECT vec_id, round(units / 1000.0, 6) AS pc1
       |FROM ppj ORDER BY vec_id""".stripMargin
  }
}
