package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The one JVM-side tokenizer for fused expressions — replays
  * `TextFunctions.tokens` column semantics exactly:
  *
  *  - space-only trim (Spark `trim(col)` strips 0x20 only), then
  *  - `split(trimmed, "(?U)\\s+")` with Spark's limit of -1, which
  *    KEEPS trailing empty tokens. Java's one-arg `Pattern.split`
  *    uses limit 0 and silently drops them — a divergence on any
  *    text ending in non-space whitespace ("a b c\n"), which is
  *    exactly why this lives in one place.
  *
  * Returns null when the trimmed text is empty (the column form's
  * empty token array).
  */
private[functions] object FusedTokenizer {

  private val ws = java.util.regex.Pattern.compile("(?U)\\s+")

  def tokens(text: UTF8String): Array[String] = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) null
    else ws.split(trimmed, -1)
  }
}
