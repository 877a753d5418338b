package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions, so `spark.sql`
  * users get them too:
  *
  *   graft_dot(a, b)            dot product over array<float|double>
  *   graft_sqnorm(a)            squared L2 norm
  *   graft_cosine(a, b)         cosine similarity
  *   graft_simhash(tokens)      64-bit SimHash of array<string>
  *   graft_rolling_fp(tokens)   order-sensitive rolling fingerprint
  *   graft_deflate_ratio(text)  DEFLATE compression ratio (quality signal)
  *   graft_lsh_sig(a, L, k)     hyperplane LSH buckets (L tables × k bits;
  *                              L and k must be foldable integers)
  *   graft_morton(a, b)         Z-order interleave of two bigints' low 31 bits
  *   graft_minhash_sketch(s, k) mergeable k-permutation MinHash AGGREGATE
  *   graft_hll_registers(s, p)  mergeable HyperLogLog register AGGREGATE
  *   graft_misra_gries(s, k)    mergeable heavy-hitter candidate AGGREGATE
  *   graft_kll_doubles(x, k)    mergeable KLL quantile-sketch AGGREGATE
  *                              (k/p must be foldable integer literals)
  *
  * Two registration paths:
  *   - `GraftExtensions` via `spark.sql.extensions` /
  *     `.withExtensions(...)` at session build time (production);
  *   - `GraftFunctions.register(spark)` on a live session (tests,
  *     notebooks).
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  private def binary(name: String)(mk: (Expression, Expression) => Expression)
      : (String, Builder) =
    name -> { args =>
      require(args.length == 2, s"$name expects 2 arguments")
      mk(args(0), args(1))
    }

  private def unary(name: String)(mk: Expression => Expression)
      : (String, Builder) =
    name -> { args =>
      require(args.length == 1, s"$name expects 1 argument")
      mk(args(0))
    }

  private val builders: Seq[(String, Builder)] = Seq(
    binary("graft_dot")(VectorExpressions.DotProduct(_, _)),
    unary("graft_sqnorm")(VectorExpressions.SquaredNorm(_)),
    binary("graft_cosine") { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      Divide(
        VectorExpressions.DotProduct(a, b),
        Multiply(Sqrt(VectorExpressions.SquaredNorm(a)),
          Sqrt(VectorExpressions.SquaredNorm(b))))
    },
    unary("graft_simhash")(TextExpressions.SimHash64(_)),
    unary("graft_rolling_fp")(TextExpressions.RollingFingerprint(_)),
    unary("graft_deflate_ratio")(TextExpressions.DeflateRatio(_)),
    binary("graft_morton")(LayoutExpressions.MortonCode(_, _)),
    "graft_lsh_sig" -> { args =>
      require(args.length == 3, "graft_lsh_sig expects 3 arguments")
      // integer-TYPED literals only: a string '4' or double 4.0 must
      // raise the intended type error, not be coerced (or crash with a
      // raw NumberFormatException) via value.toString.toInt
      def intLit(e: Expression, what: String): Int = {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        e match {
          case Literal(v: Byte, ByteType)   => v.toInt
          case Literal(v: Short, ShortType) => v.toInt
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) if v.isValidInt => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_lsh_sig $what must be an integer literal, got $other")
        }
      }
      VectorExpressions.HyperplaneSignature(args(0),
        intLit(args(1), "table count"), intLit(args(2), "bit count"))
    },
    // the mergeable sketch AGGREGATES (q149/q154/q162's machinery):
    // the registry accepts a bare AggregateFunction — the analyzer
    // wraps it in an AggregateExpression like any built-in agg
    "graft_minhash_sketch" -> { args =>
      require(args.length == 2, "graft_minhash_sketch expects 2 arguments")
      SketchAggregates.MinHashSketch(args(0),
        foldableInt(args(1), "graft_minhash_sketch permutation count"))
    },
    "graft_hll_registers" -> { args =>
      require(args.length == 2, "graft_hll_registers expects 2 arguments")
      SketchAggregates.HllRegisters(args(0),
        foldableInt(args(1), "graft_hll_registers precision"))
    },
    "graft_misra_gries" -> { args =>
      require(args.length == 2, "graft_misra_gries expects 2 arguments")
      SketchAggregates.MisraGries(args(0),
        foldableInt(args(1), "graft_misra_gries counter budget"))
    },
    "graft_kll_doubles" -> { args =>
      require(args.length == 2, "graft_kll_doubles expects 2 arguments")
      SketchAggregates.KllDoubles(args(0),
        foldableInt(args(1), "graft_kll_doubles sketch parameter k"))
    }
  )

  /** Integer-TYPED literal extraction shared by the parameterized
    * builders (same discipline as graft_lsh_sig's intLit). */
  private def foldableInt(e: Expression, what: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    e match {
      case Literal(v: Byte, ByteType)   => v.toInt
      case Literal(v: Short, ShortType) => v.toInt
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) if v.isValidInt => v.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  private[functions] def inject(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name), b))
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.inject(e)
}
