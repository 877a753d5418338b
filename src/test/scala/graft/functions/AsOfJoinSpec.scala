package graft.functions

import graft.SparkSpec

/** Randomized brute-force cross-check for the as-of join: the
  * union+window composition must agree with a naive per-left-row scan
  * of the right side on arbitrary key/timestamp distributions —
  * including duplicate left timestamps, keys with empty right sides,
  * and payload NULLs.
  */
class AsOfJoinSpec extends SparkSpec {

  test("asof equals a brute-force per-row scan on random data") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nKeys = 4
      val left = (1 to 120).map { i =>
        (rnd.nextInt(nKeys).toLong, new java.sql.Timestamp(rnd.nextInt(1000) * 1000L), i.toLong)
      }
      // one key (3) gets no right rows at all
      val right = (1 to 80).map { _ =>
        (rnd.nextInt(nKeys - 1).toLong,
          new java.sql.Timestamp(rnd.nextInt(1000) * 1000L),
          if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None,
          "tag" + rnd.nextInt(5))
      }
      import spark.implicits._
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "v", "w")

      val collected = AsOfJoin.asof(lDf, rDf, Seq("k"), "t", "t",
        Seq("v" -> "av", "w" -> "aw"))
        .select("lid", "av", "aw").collect()
      // exactly one output row per left row — a tie must never fan out
      assert(collected.length == left.size, s"trial $trial row count")
      val got = collected
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

      // brute force: latest right row with ts <= left ts per key;
      // among equal right timestamps any row is admissible, so only
      // assert strict cases (unique max-ts winner), which the
      // generator makes overwhelmingly common
      val byKey = right.groupBy(_._1)
      left.foreach { case (k, t, lid) =>
        val candidates = byKey.getOrElse(k, Seq.empty)
          .filter(!_._2.after(t))
        if (candidates.isEmpty) {
          assert(got(lid) == ((None, None)), s"trial $trial lid $lid")
        } else {
          val maxTs = candidates.map(_._2.getTime).max
          val winners = candidates.filter(_._2.getTime == maxTs)
          if (winners.size == 1) {
            val wRow = winners.head
            assert(got(lid) == ((wRow._3, Some(wRow._4))),
              s"trial $trial lid $lid key $k ts $t: ${got(lid)} vs $wRow")
          } else {
            // tied right rows: result must be one of them, atomically
            assert(winners.exists(wr => got(lid) == ((wr._3, Some(wr._4)))),
              s"trial $trial lid $lid tie not honored atomically")
          }
        }
      }
    }
  }

  test("asof rejects inputs that would corrupt the tagged union") {
    import spark.implicits._
    val l = Seq((1L, new java.sql.Timestamp(1000L), "x")).toDF("k", "t", "a")
    val r = Seq((1L, new java.sql.Timestamp(500L), 1.0)).toDF("k", "t", "v")

    // payload dst colliding with a left column
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v" -> "a"))
    }
    // duplicate payload dst names
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), "t", "t", Seq("v" -> "p", "v" -> "p"))
    }
    // reserved __ prefix on either input side
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l.withColumnRenamed("a", "__a"), r, Seq("k"), "t", "t",
        Seq("v" -> "p"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r.withColumnRenamed("v", "__v"), Seq("k"), "t", "t",
        Seq("__v" -> "p"))
    }
  }
}
