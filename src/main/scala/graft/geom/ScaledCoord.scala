package graft.geom

/** Coordinate quantization: degrees <-> scaled 32-bit ints.
  *
  * Mirrors the reference's lossy coordinate codec
  * (`/root/reference/geomedea/src/geometry/mod.rs:282-343`):
  * 1 unit = 100 nanodegrees, i.e. scale factor 1e7, and conversion
  * **truncates toward zero** (Rust `as i32`), it does not round.
  * Golden: (-118.2562, 34.1060) -> (-1182562000, 341060000)
  * (`geometry/mod.rs:351-355`).
  */
object ScaledCoord {
  val CoordScaleFactor: Double = 1e7

  /** degrees -> scaled int, truncating toward zero (NOT rounding). */
  def toScaled(degrees: Double): Int = (degrees * CoordScaleFactor).toInt

  /** scaled int -> degrees. */
  def toDegrees(scaled: Int): Double = scaled / CoordScaleFactor

  /** degrees -> scaled int, rounding to nearest. This is the exact inverse
    * of [[toDegrees]] for any int (|error| of toDegrees(i)*1e7 vs i is
    * < 0.5 units), used when decoding OUR OWN encoded WKB so coordinates
    * roundtrip bit-exactly. Quantization of *external* degree input keeps
    * the reference's truncation semantics ([[toScaled]]).
    */
  def roundScaled(degrees: Double): Int = Math.round(degrees * CoordScaleFactor).toInt
}
