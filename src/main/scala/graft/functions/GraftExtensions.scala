package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native Catalyst expressions as SQL functions, so SQL
  * users get the codegen'd vector math too:
  *
  *   SELECT graft_vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT graft_hyperplane_sig(embedding, 8, 0) AS bucket FROM ...
  *
  * Production path: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (the standard `SparkSessionExtensions` injection point). For an
  * already-running session, call [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // operatorOptimization: runs inside the main optimizer batch, so the
    // rewrite composes with constant folding / pruning in either order
    ext.injectOptimizerRule(_ => graft.plans.RewriteIntersectionSize)
    // extra strategies are consulted BEFORE the built-ins, so the
    // broadcast range join wins over BroadcastNestedLoopJoin on its shape
    ext.injectPlannerStrategy(_ => graft.plans.BroadcastRangeJoinStrategy)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.VectorMath", null, name, usage,
      "", "", "", "", "", "", "built-in")

  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two float/double vectors"),
      { args =>
        require(args.length == 2, "graft_vec_dot takes (vector, vector)")
        VectorMath.VecDot(args(0), args(1))
      })

  val hyperplaneSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig",
        "graft_hyperplane_sig(vec, numBits, seed) - random-hyperplane LSH bucket"),
      { args =>
        require(args.length == 3, "graft_hyperplane_sig takes (vector, numBits, seed)")
        VectorMath.HyperplaneSig(args(0),
          intArg(args(1), "numBits"), intArg(args(2), "seed"))
      })

  val intersectCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - |a ∩ b| for two bigint arrays, no array materialization"),
      { args =>
        require(args.length == 2, "graft_intersect_count takes (array, array)")
        ArraySetOps.IntersectCount(args(0), args(1))
      })

  val countInSet: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_count_in_set"),
      info("graft_count_in_set",
        "graft_count_in_set(tokens, array('a','b')) - tokens present in the literal set, with multiplicity"),
      { args =>
        require(args.length == 2, "graft_count_in_set takes (tokens, set literal)")
        val set = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _)
              if elems.forall(_.foldable) =>
            elems.map(_.eval() match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case s: String => s
              case other => throw new IllegalArgumentException(
                s"set elements must be strings, got $other")
            })
          case other => throw new IllegalArgumentException(
            s"the set must be a literal array of strings, got $other")
        }
        ArraySetOps.CountInSet(args(0), set)
      })

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val simhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of a string-token array"),
      { args =>
        require(args.length == 1, "graft_simhash64 takes (tokens)")
        TextHashes.SimHash64(args(0))
      })

  val minhashSigs: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_minhash_sigs"),
      info("graft_minhash_sigs",
        "graft_minhash_sigs(shingle_hashes, numHashes) - MinHash signature array"),
      { args =>
        require(args.length == 2, "graft_minhash_sigs takes (shingle_hashes, numHashes)")
        TextHashes.MinHashSigs(args(0), intArg(args(1), "numHashes"))
      })

  val hashedShingles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_hashed_shingles"),
      info("graft_hashed_shingles",
        "graft_hashed_shingles(tokens, n) - distinct 64-bit hashes of token n-grams " +
          "in first-occurrence order (sort with sort_array if order matters); " +
          "fewer than n tokens yields an empty array"),
      { args =>
        require(args.length == 2, "graft_hashed_shingles takes (tokens, n)")
        TextHashes.HashedShingles(args(0), intArg(args(1), "n"))
      })

  val wsTokenCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ws_token_count"),
      info("graft_ws_token_count",
        "graft_ws_token_count(text) - whitespace-token count, single byte scan"),
      { args =>
        require(args.length == 1, "graft_ws_token_count takes (text)")
        TextScan.WsTokenCount(args(0))
      })

  val bpeTokenCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bpe_token_count"),
      info("graft_bpe_token_count",
        "graft_bpe_token_count(text) - BPE-ish subword token estimate, single byte scan"),
      { args =>
        require(args.length == 1, "graft_bpe_token_count takes (text)")
        TextScan.BpeTokenCount(args(0))
      })

  val jaroWinkler: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] over UTF-8 bytes"),
      { args =>
        require(args.length == 2, "graft_jaro_winkler takes (string, string)")
        StringSimilarity.JaroWinkler(args(0), args(1))
      })

  val damerauLevenshtein: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_damerau_levenshtein"),
      info("graft_damerau_levenshtein",
        "graft_damerau_levenshtein(a, b) - full Damerau-Levenshtein edit distance over UTF-8 bytes"),
      { args =>
        require(args.length == 2, "graft_damerau_levenshtein takes (string, string)")
        StringSimilarity.DamerauLevenshtein(args(0), args(1))
      })

  val nfcNormalize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC canonical composition"),
      { args =>
        require(args.length == 1, "graft_nfc takes (string)")
        UnicodeNorm.NfcNormalize(args(0))
      })

  val all = Seq(vecDot, hyperplaneSig, intersectCount, countInSet,
    simhash64, minhashSigs, hashedShingles, wsTokenCount, bpeTokenCount,
    jaroWinkler, damerauLevenshtein, nfcNormalize)

  /** Idempotently register on a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, inf, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
  }
}
