package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** `SparkSessionExtensions` surface: the engine's scalar functions as
  * SQL-callable Catalyst expressions, so a `spark.sql` user gets the same
  * semantics as the Column API without UDFs (the builders compose
  * codegen-friendly built-in expressions, no black boxes).
  *
  * Register with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  *  - `fill_digits(ts)` — 13-digit ms normalization
  *    (`tdb-core/src/utils.rs:11-22`)
  *  - `ts_seconds(ts)` — normalized epoch seconds (`time_bars.rs:28,85`)
  *  - `discretize(price, decimals)` / `undiscretize(level, decimals)` —
  *    price-level integerization (`postprocessing/orderbook.rs:27-34`)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "fill_digits", "normalize an epoch to 13-digit ms",
      { case Seq(ts) => fillDigitsExpr(ts) })
    register(ext, "ts_seconds", "normalized epoch seconds",
      { case Seq(ts) => tsSecondsExpr(ts) })
    register(ext, "discretize", "price -> integer level at 10^decimals",
      { case Seq(price, d) => discretizeExpr(price, d) })
    register(ext, "undiscretize", "integer level -> price at 10^decimals",
      { case Seq(level, d) => undiscretizeExpr(level, d) })
    register(ext, "array_dot", "codegen'd dot product of two array<double>",
      { case Seq(a, b) => ArrayDotProduct(a, b) })
    // text-pipeline scalars (same semantics as graft.ext.TextOps;
    // ExtensionsSpec pins SQL == Column API on shared inputs)
    register(ext, "token_count", "whitespace token count",
      { case Seq(t) => tokenCountExpr(t) })
    register(ext, "bpe_token_count", "GPT-2-style pre-token count",
      { case Seq(t) => bpeTokenCountExpr(t) })
    register(ext, "ln_q", "ln quantized to 12 decimals (bit-portable idf)",
      { case Seq(x) => lnQExpr(x) })
  }

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String, builder: PartialFunction[Seq[Expression], Expression])
      : Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name),
      (exprs: Seq[Expression]) =>
        builder.applyOrElse(exprs, (_: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: wrong number of arguments (${exprs.length})"))))
}

object GraftExtensions {

  private val Lim = Literal(1000000000000L)

  /** Catalyst tree mirroring `functions.fillDigits`: the smallest
    * `ts * 10^k >= 10^12` wins; 0 stays 0. */
  def fillDigitsExpr(ts0: Expression): Expression = {
    val ts = Cast(ts0, LongType)
    val base = (EqualTo(ts, Literal(0L)),
      ts) :: (GreaterThanOrEqual(ts, Lim), ts) :: Nil
    val branches = base ++ (1 to 7).map { k =>
      val m = Multiply(ts, Literal(math.pow(10, k).toLong))
      (GreaterThanOrEqual(m, Lim), m: Expression)
    }
    CaseWhen(branches, Some(ts))
  }

  def tsSecondsExpr(ts: Expression): Expression =
    Cast(Divide(Cast(fillDigitsExpr(ts), DoubleType), Literal(1000.0)),
      LongType)

  def discretizeExpr(price: Expression, decimals: Expression): Expression =
    Cast(Floor(Multiply(Cast(price, DoubleType),
      Pow(Literal(10.0), Cast(decimals, DoubleType)))), LongType)

  def undiscretizeExpr(level: Expression, decimals: Expression): Expression =
    Divide(Cast(level, DoubleType),
      Pow(Literal(10.0), Cast(decimals, DoubleType)))

  /** `size(split(trim(text), '\s+'))` — graft.ext.TextOps.tokenCount. */
  def tokenCountExpr(text: Expression): Expression =
    Size(StringSplit(StringTrim(text), Literal("\\s+"), Literal(-1)))

  /** `size(regexp_extract_all(text, BpePattern, 0))` —
    * graft.ext.TextOps.bpeTokenCount. */
  def bpeTokenCountExpr(text: Expression): Expression =
    Size(RegExpExtractAll(text,
      Literal(graft.ext.TextOps.BpePattern), Literal(0)))

  /** `floor(ln(x) * 1e12) / 1e12` — graft.ext.TextOps.lnQ. */
  def lnQExpr(x: Expression): Expression =
    Divide(
      Cast(Floor(Multiply(Log(Cast(x, DoubleType)), Literal(1e12))),
        DoubleType),
      Literal(1e12))
}
