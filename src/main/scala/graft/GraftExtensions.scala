package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: registers the engine's custom
  * Catalyst expressions on every session created with
  *
  * {{{
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * This is the cluster-deployment path (no per-session registration
  * calls): `vec_dot` (codegen'd float-vector dot product),
  * `vec_cosine` (cosine similarity composed from it, same
  * left-to-right double accumulation the oracles mirror),
  * `rolling_hash` (codegen'd document fingerprint), and `jira_tasks`
  * (the LATERAL VIEW fan-out generator) become available in plain SQL
  * everywhere.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** A foldable, non-null integer literal argument — NULL is foldable
    * too, so a bare eval().intValue() would NPE out of the builder.
    */
  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval()
    require(v != null, s"$what must be a non-null integer literal")
    v.asInstanceOf[Number].intValue()
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    // strength reduction: composed md5-prefix hash → fused expression
    e.injectOptimizerRule(_ => graft.plans.Md5PrefixRewrite)
    // strength reduction: aggregate(zip_with(...)) squared-distance
    // fold → codegen'd vec_sq_dist primitive loop
    e.injectOptimizerRule(_ => graft.plans.VecSqDistRewrite)
    // strength reduction: aggregate(zip_with(...)) dot-product fold
    // → codegen'd vec_dot primitive loop
    e.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
    // strength reduction: size(array_intersect(a, b)) over string
    // arrays → single-pass counting kernel (the Jaccard verify shape)
    e.injectOptimizerRule(_ => graft.plans.ArrayIntersectSizeRewrite)
    // whole-operator extension: the native backward as-of join
    // (logical AsOfJoin → AsOfJoinExec sorted merge)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        info("vec_dot", "vec_dot(a, b) - dot product of float arrays"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "vec_dot(arrayA, arrayB)")
          functions.VectorDot(exprs(0), exprs(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("vec_cosine"),
        info("vec_cosine", "vec_cosine(a, b) - cosine similarity of float arrays"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "vec_cosine(arrayA, arrayB)")
          // must be a resolved Catalyst tree (bridging the Column-DSL
          // form of VectorMath.vecCosine leaves UnresolvedFunction
          // nodes the registry path never resolves); this tree is the
          // expression-level mirror of vecCosine, kept in sync by the
          // extensions spec asserting both paths agree
          import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
          val (a, b) = (exprs(0), exprs(1))
          Divide(
            functions.VectorDot(a, b),
            Multiply(
              Sqrt(functions.VectorDot(a, a)),
              Sqrt(functions.VectorDot(b, b))
            )
          )
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("vec_sq_dist"),
        info("vec_sq_dist",
          "vec_sq_dist(x, c) - squared L2 distance, float x double arrays"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "vec_sq_dist(floatArray, doubleArray)")
          functions.VectorSqDist(exprs(0), exprs(1))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        info("minhash_sig",
          "minhash_sig(shingles, k) - single-pass k-minima MinHash signature"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "minhash_sig(arrayOfString, numHashes)")
          functions.MinHashSig(exprs(0), intLit(exprs(1), "numHashes"))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("minhash_text"),
        info("minhash_text",
          "minhash_text(text, n, k) - fused tokenize/shingle/MinHash signature"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3, "minhash_text(text, shingleN, numHashes)")
          functions.MinHashText(
            exprs(0),
            intLit(exprs(1), "shingleN"),
            intLit(exprs(2), "numHashes")
          )
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("simhash_text"),
        info("simhash_text",
          "simhash_text(text, bits) - in-row SimHash signature, no shuffle"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "simhash_text(text, bits)")
          functions.SimHashText(exprs(0), intLit(exprs(1), "bits"))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("text_stats"),
        info("text_stats",
          "text_stats(s) - single-pass token/stopword/punct/char counts"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "text_stats(str)")
          functions.TextStats(exprs.head)
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("lang_counts"),
        info("lang_counts",
          "lang_counts(s) - per-language marker-word hit counts"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "lang_counts(str)")
          functions.LangCounts(exprs.head)
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("repetition_counts"),
        info("repetition_counts",
          "repetition_counts(s) - token/bigram totals and distincts"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "repetition_counts(str)")
          functions.RepetitionCounts(exprs.head)
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("shingles"),
        info("shingles",
          "shingles(text, n) - distinct word n-grams, fused tokenizer"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, "shingles(text, n)")
          functions.Shingles(exprs(0), intLit(exprs(1), "n"))
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("hash60"),
        info("hash60",
          "hash60(s) - 60-bit md5-prefix content hash (split/shard key)"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "hash60(str)")
          functions.Md5Prefix60(exprs.head)
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("rolling_hash"),
        info("rolling_hash", "rolling_hash(s) - polynomial rolling fingerprint mod 1e9+7"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "rolling_hash(str)")
          functions.RollingHash(exprs.head)
        }
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("jira_tasks"),
        info("jira_tasks", "jira_tasks(issueStruct) - training-task fan-out"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, "jira_tasks(issueStruct)")
          jira.JiraTasksGenerator(exprs.head)
        }
      )
    )
  }
}
