package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (builder prompt: language-ID, quality scoring, token counting,
  * fingerprinting) over the `documents` table.
  *
  * All token work uses codegen'd built-ins (`split`, higher-order
  * array functions) — no UDFs — so the hot path stays inside
  * whole-stage codegen and scales linearly with input splits.
  */
object TextOps {

  /** Token counting + basic text stats. Whitespace tokenization on the
    * single-space-separated corpus; avg token length derived purely
    * from scalar arithmetic so both engines agree exactly. */
  val q30TextStats: QueryDef = QueryDef.withOracle(
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_char,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |  floor(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |        / len(string_split(text, ' ')) * 1000 + 0.5) / 1000 AS avg_tok_len
      |FROM documents""".stripMargin
  ) { (s, d) =>
    val nTok = size(split(col("text"), " ", -1))
    // integer/integer ratio → floor-round (engine-identical doubles)
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_char"),
      nTok.cast("long").as("n_tok"),
      (floor((length(col("text")) - (nTok - 1)).cast("double") / nTok * 1000
        + 0.5) / 1000).as("avg_tok_len"))
  }

  /** Quality scoring in the reference's quality_score style
    * (bronze_to_silver.py:150-165: 1.0 minus weighted penalties,
    * floor at 0): penalties for very short docs, high stopword ratio,
    * low vocabulary diversity. */
  val q31TextQuality: QueryDef = QueryDef.withOracle(
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |    len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a'))) AS n_stop
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(n_tok AS BIGINT) AS n_tok,
      |  CAST(n_uniq AS BIGINT) AS n_uniq,
      |  floor(CAST(n_stop AS DOUBLE) / n_tok * 10000 + 0.5) / 10000 AS stop_ratio,
      |  floor(greatest(0.0, 1.0
      |    - 0.3 * (CAST(n_stop AS DOUBLE) / n_tok)
      |    - (CASE WHEN n_tok < 20 THEN 0.2 ELSE 0.0 END)
      |    - 0.2 * (1.0 - CAST(n_uniq AS DOUBLE) / n_tok)) * 10000 + 0.5) / 10000
      |    AS quality_score
      |FROM t""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ", -1)
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    val nStop = size(filter(toks, x => x.isin("the", "a")))
    val stopRatio = nStop.cast("double") / nTok
    // integer-ratio formula → floor-round (see q21/q23 rationale)
    Tables.documents(s, d).select(
      col("doc_id"),
      nTok.cast("long").as("n_tok"),
      nUniq.cast("long").as("n_uniq"),
      (floor(stopRatio * 10000 + 0.5) / 10000).as("stop_ratio"),
      (floor(greatest(lit(0.0), lit(1.0)
        - lit(0.3) * stopRatio
        - when(nTok < 20, 0.2).otherwise(0.0)
        - lit(0.2) * (lit(1.0) - nUniq.cast("double") / nTok)) * 10000 + 0.5)
        / 10000).as("quality_score"))
  }

  /** Corpus rollup per language: volume, length stats, source spread.
    * (A7 chart group-by shape over the documents table.) */
  val q32LangStats: QueryDef = QueryDef.withOracle(
    """SELECT lang, count(*) AS n_docs,
      |  floor(avg(CAST(n_chars AS DOUBLE)) * 1000 + 0.5) / 1000 AS avg_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      (floor(avg(col("n_chars").cast("double")) * 1000 + 0.5) / 1000)
        .as("avg_chars"),
      countDistinct(col("source")).as("n_sources"))
  }

  /** Document fingerprinting: md5 over the sorted distinct token set —
    * an order-insensitive content fingerprint usable as an exact-dedup
    * key that survives token reordering. */
  val q33Fingerprint: QueryDef = QueryDef.withOracle(
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
      |    AS fingerprint
      |FROM documents""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ", -1)))))
        .as("fingerprint"))
  }

  /** Language-ID by stopword-marker scoring: per-language marker token
    * counts, predict the argmax (ties → 'und'). A real n-gram
    * profile would extend the marker table; the operator shape
    * (tokenize → per-class score → argmax) is the production one. */
  val q34LangId: QueryDef = QueryDef.withOracle(
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(toks, x -> x IN ('the', 'a', 'of'))) AS sc_en,
      |    len(list_filter(toks, x -> x IN ('la', 'el', 'de'))) AS sc_es,
      |    len(list_filter(toks, x -> x IN ('der', 'die', 'das'))) AS sc_de
      |  FROM t)
      |SELECT doc_id, lang AS labeled_lang,
      |  CASE WHEN sc_en >= sc_es AND sc_en >= sc_de AND sc_en > 0 THEN 'en'
      |       WHEN sc_es > sc_en AND sc_es >= sc_de THEN 'es'
      |       WHEN sc_de > sc_en AND sc_de > sc_es THEN 'de'
      |       ELSE 'und' END AS predicted_lang
      |FROM s""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ", -1)
    val scEn = size(filter(toks, x => x.isin("the", "a", "of")))
    val scEs = size(filter(toks, x => x.isin("la", "el", "de")))
    val scDe = size(filter(toks, x => x.isin("der", "die", "das")))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), scEn.as("sc_en"), scEs.as("sc_es"),
        scDe.as("sc_de"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        when(col("sc_en") >= col("sc_es") && col("sc_en") >= col("sc_de") &&
          col("sc_en") > 0, "en")
          .when(col("sc_es") > col("sc_en") && col("sc_es") >= col("sc_de"), "es")
          .when(col("sc_de") > col("sc_en") && col("sc_de") > col("sc_es"), "de")
          .otherwise("und").as("predicted_lang"))
  }

  /** BPE-ish token estimation via regex unit counting (letters runs,
    * single digits, single punctuation — the coarse shape of a BPE
    * pre-tokenizer), alongside whitespace tokens for comparison. */
  val q35TokenEstimate: QueryDef = QueryDef.withOracle(
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT)
      |    AS bpe_units,
      |  floor(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS DOUBLE)
      |    / len(string_split(text, ' ')) * 1000 + 0.5) / 1000 AS units_per_token
      |FROM documents""".stripMargin
  ) { (s, d) =>
    val ws = size(split(col("text"), " ", -1))
    val units = size(expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]', 0)"))
    Tables.documents(s, d).select(
      col("doc_id"),
      ws.cast("long").as("ws_tokens"),
      units.cast("long").as("bpe_units"),
      (floor(units.cast("double") / ws * 1000 + 0.5) / 1000)
        .as("units_per_token"))
  }

  /** Order-sensitive rolling-hash fingerprint (native expression):
    * detects exact token-sequence duplicates in one map-only pass.
    * Rows-only (engine-specific hash); grouped so the output is the
    * duplicate-sequence histogram. */
  val q36RollingFingerprint: QueryDef = QueryDef.rowsOnly { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextExpressions.rollingFingerprint(
          split(col("text"), " ", -1)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
  }

  val all: Map[String, QueryDef] = Map(
    "q30_text_stats" -> q30TextStats,
    "q31_text_quality" -> q31TextQuality,
    "q32_lang_stats" -> q32LangStats,
    "q33_fingerprint" -> q33Fingerprint,
    "q34_lang_id" -> q34LangId,
    "q35_token_estimate" -> q35TokenEstimate,
    "q36_rolling_fingerprint" -> q36RollingFingerprint
  )
}
