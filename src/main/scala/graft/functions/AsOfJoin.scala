package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the
  * greatest right-timestamp ≤ the left's timestamp, per key — the
  * telemetry/market-data join Spark lacks natively.
  *
  * Built by COMPOSITION (preference (a) of the build brief — no
  * custom LogicalPlan needed): union both sides tagged, one window
  * pass per key ordered by (ts, side) carries the latest right
  * payload forward via last_value(ignoreNulls), then keep left rows.
  *
  * Scale shape: ONE shuffle of |L|+|R| rows keyed by the join key,
  * one ordered window pass — strictly cheaper than the range-join
  * fallback (|L|·|R| per key worst case) a naive theta-join would
  * plan, and it needs no skew handling beyond the window's own
  * partitioning.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (history/dimension rows)
    * @param keyCols   equi-key column names present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to carry (renamed as given)
    * @param rightTiebreak right column breaking ties between right
    *                  rows at the SAME timestamp: the greatest value
    *                  wins. Without it, two same-instant right rows
    *                  make the carried pick partial-sort-order
    *                  dependent — fine when (key, ts) is unique
    *                  (SCD2 dims), required for raw event streams.
    * @return left rows + payload columns (null when no right row ≤ ts)
    */
  /** As-of join with a MAX-STALENESS bound (pandas
    * `merge_asof(tolerance=...)` semantics): the carried right row is
    * kept only when `leftTs − rightTs ≤ toleranceUs`, else the payload
    * columns are null — "the latest quote, but not if it's more than
    * a week old". Because the as-of pick is the LATEST right row ≤ ts,
    * it is also the closest, so pick-then-nullify is exactly the
    * bounded-match semantics (no second pass needed). Costs nothing
    * over [[asof]]: the matched timestamp rides the same payload
    * struct and the staleness test is one map-side projection. */
  def asofTolerance(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[(String, String)],
      toleranceUs: Long,
      rightTiebreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.{unix_micros, when, lit}
    val mts = "__tol_mts"
    require(!payload.exists(_._2 == mts), s"payload name $mts is reserved")
    val joined = asof(left, right, keyCols, leftTs, rightTs,
      payload :+ (rightTs -> mts), rightTiebreak)
    // null mts (no match at all) compares to null → otherwise-branch
    // keeps the already-null payload
    val stale =
      unix_micros(col(leftTs)) - unix_micros(col(mts)) > toleranceUs
    payload.map(_._2).foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(stale, lit(null).cast(df.schema(c).dataType))
        .otherwise(col(c)))
    }.drop(mts)
  }

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`):
    * for every left row, the single right row with the SMALLEST
    * right-timestamp ≥ the left's timestamp, per key — "the first
    * purchase after the signup". Composed by time negation: negating
    * both sides' epoch-µs turns earliest-at-or-after into the
    * backward join's latest-at-or-before, so the same one-shuffle
    * union+window machinery serves both directions (same-instant
    * right rows stay visible to the left row under negation, matching
    * DuckDB's `l.ts <= r.ts` ASOF inclusivity). */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[(String, String)],
      rightTiebreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.unix_micros
    val ln = "gx_fwd_neg_lts"
    val rn = "gx_fwd_neg_rts"
    require(!left.columns.contains(ln) && !right.columns.contains(rn),
      s"asofForward reserves the column names $ln/$rn")
    asof(
      left.withColumn(ln, -unix_micros(col(leftTs))),
      right.withColumn(rn, -unix_micros(col(rightTs))),
      keyCols, ln, rn, payload, rightTiebreak)
      .drop(ln)
  }

  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[(String, String)],
      rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = payload.map(_._2).filter(leftCols.contains)
    require(clash.isEmpty,
      s"asof payload output names collide with left columns: $clash")
    val dupDst = payload.map(_._2).diff(payload.map(_._2).distinct)
    require(dupDst.isEmpty,
      s"asof payload output names must be distinct, got duplicates: $dupDst")
    val reserved = (leftCols ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asof reserves the __ column-name prefix for its tagged union: $reserved")
    // tagged union: right rows sort BEFORE left rows at equal ts so a
    // same-instant right row is visible to the left row (ts >= s.ts).
    // The payload travels as ONE struct per right row — always
    // non-null for right rows even when every field is null — so
    // last(ignoreNulls) carries the whole matched row: a legitimately
    // NULL payload value is preserved, and multiple payload columns
    // can never mix values from different right rows.
    // __tb exists only when a tiebreak was requested: a constant null
    // sort key would be a no-op for every caller without one (and
    // NullType ordering is an edge path that has shifted across Spark
    // versions — don't ride it for nothing).
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        rightTiebreak.map(tb => col(tb).as("__tb")).toSeq ++
        Seq(struct(payload.map { case (src, dst) => col(src).as(dst) }: _*)
          .as("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        rightTiebreak.map(_ =>
          lit(null).cast(taggedRight.schema("__tb").dataType).as("__tb")).toSeq ++
        Seq(lit(null).cast(taggedRight.schema("__p").dataType).as("__p")) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => col(c).as(s"__l_$c")): _*)
    // __side still decides right-before-left at equal ts; __tb only
    // orders right rows among themselves (ascending → `last` carries
    // the greatest tiebreak). Left rows all have a null __tb.
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("__ts"), col("__side")) ++
        rightTiebreak.map(_ => col("__tb")): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++
          leftCols.filterNot(keyCols.contains)
            .map(c => col(s"__l_$c").as(c)) ++
          payload.map { case (_, dst) => col("__c").getField(dst).as(dst) }: _*)
  }
}
