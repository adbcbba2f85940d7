package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss RANDOM PROJECTION — the dimensionality-reduction
  * stage a 100 TB embedding pipeline runs before ANN indexing or
  * clustering: d-dim vectors down to k dims with pairwise distances
  * preserved within (1 ± eps) (JL lemma; sign/Rademacher projections per
  * Achlioptas 2003, "Database-friendly random projections").
  *
  * The projection matrix is DETERMINISTIC: sign(k, d) = ±1 from the
  * engine's cross-engine hash ([[graft.functions.Hash64]], seed "rp"), so
  * any engine reproduces the same matrix from the formula — which is what
  * makes the output oracle-checkable AND what a re-run / backfill needs
  * anyway (a projection that changes between runs corrupts every
  * downstream index).
  *
  * Scale shape: the matrix is built ONCE driver-side (outDims × dims
  * doubles — model-size, like k-means centroids) and embedded as a plan
  * literal; per row the projection is outDims codegen'd multiply-add
  * folds over the vector — zero shuffle, zero per-row hashing, no UDF.
  * Components are emitted fixed-point (×1e6, rounded) so floats never
  * cross an oracle boundary un-rounded.
  */
object RandomProjection {

  /** The deterministic ±1 sign matrix: sign(k, d) from
    * hash64("rp", s"$k,$d") parity. */
  def signMatrix(outDims: Int, dims: Int): Array[Array[Double]] = {
    val md = graft.functions.Hash64.newMd5()
    val prefix = graft.functions.Hash64.seedPrefix("rp")
    Array.tabulate(outDims, dims) { (k, d) =>
      val h = graft.functions.Hash64.hash64(
        md, prefix, s"$k,$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (h % 2 == 0) 1.0 else -1.0
    }
  }

  /** Project `vecCol` (array<float|double>, length `dims`) to `outDims`
    * fixed-point components p0..p{outDims-1} (×1e6). */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      dims: Int, outDims: Int): DataFrame = {
    require(dims > 0 && outDims > 0, s"bad dims $dims -> $outDims")
    val signs = signMatrix(outDims, dims)
    def dot(vec: Column, k: Int): Column =
      aggregate(
        zip_with(vec, typedLit(signs(k).toSeq), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
    val comps = (0 until outDims).map { k =>
      round(dot(col(vecCol), k) * 1e6).cast("long").as(s"p$k")
    }
    emb.select(col(idCol) +: comps: _*)
  }
}
