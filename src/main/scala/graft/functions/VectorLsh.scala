package graft.functions

/** Deterministic random-hyperplane LSH parameters, shared by the Spark
  * operator ([[graft.ops.VectorOps.embedPairSimLsh]]) and the generated
  * DuckDB oracle SQL — the sign matrix is embedded in both as literals,
  * so the approximate result is bit-reproducible cross-engine.
  *
  * 16 hyperplanes = 4 bands × 4 bits. P(bit agrees) = 1 − θ/π, so a
  * cos≈1 near-dup pair shares a band with probability ≈ 1 while random
  * pairs (θ≈90°, p≈0.5) collide on a 4-bit band with p ≈ 6% per band —
  * the candidate set is a small slice of the n² pair space.
  */
object VectorLsh {
  val Dim = 64
  val Bands = 4
  val RowsPerBand = 4

  /** ±1 hyperplane signs, fixed seed → identical on every run/JVM. */
  val signs: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Bands * RowsPerBand, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** DuckDB list literal for hyperplane `b`, e.g. `[1.0,-1.0,...]`. */
  def signsSqlLiteral(b: Int): String =
    signs(b).mkString("[", ",", "]")
}
