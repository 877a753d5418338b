package graft.streaming

/** Timestamp → FULL epoch-µs for the stateful processors.
  * `Timestamp.getTime` alone truncates to milliseconds — but the
  * batch twins these processors must match row-for-row (q156's
  * debounce, q173's CUSUM) compare at `unix_micros` precision, so a
  * sub-millisecond gap component would flip keep/suppress decisions
  * between batch and stream. getTime carries the integral millis of
  * the nanos field; subtracting it back and re-adding nanos/1000
  * restores the exact microsecond value parquet stored. */
private[streaming] object EventTime {
  def micros(ts: java.sql.Timestamp): Long =
    (ts.getTime - ts.getNanos / 1000000) * 1000L + ts.getNanos / 1000
}
