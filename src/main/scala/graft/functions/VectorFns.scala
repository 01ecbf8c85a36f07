package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * All math is promoted to Double and accumulated left-to-right
  * (`aggregate` over `zip_with`), which is both the numerically saner choice
  * and bit-compatible with a double-cast oracle. Pure expressions — codegen
  * keeps the O(n·d) similarity hot loop inside Tungsten.
  */
object VectorFns {

  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-vector int8 scalar quantization: each component maps to
    * `round((x - lo) / ((hi - lo) / 255)) - 128` ∈ [-128, 127], where
    * `lo`/`hi` are the vector's own min/max (pass them precomputed so
    * codegen evaluates the array scan once, not once per element).
    * Degenerate constant vectors quantize to -128. 4× memory cut for
    * ANN candidate stores; exact same expression is portable SQL.
    */
  def int8Quantize(v: Column, lo: Column, hi: Column): Column =
    transform(v, x =>
      when(hi === lo, lit(-128))
        .otherwise(round((x - lo) / ((hi - lo) / lit(255.0))).cast("int") - 128))
}
