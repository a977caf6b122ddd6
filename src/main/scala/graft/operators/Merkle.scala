package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Merkle-style range summaries for anti-entropy reconciliation —
  * q57's engine, reusable: any keyed table folds to `buckets` rows of
  * (bucket, row count, order-independent content digest), and two
  * summaries diff without ever joining facts. At 100 TB each side is
  * one aggregate; the comparison reads 2·`buckets` rows.
  */
object Merkle {

  /** Digest modulus: largest prime < 2^31, so per-bucket sums of
    * residues stay far from BIGINT overflow at any realistic bucket
    * row count (2^31 · rows < 2^63 up to ~4e9 rows per bucket).
    */
  val DigestMod = 2147483647L

  /** Fold `df` to (bucket, `nCol`, `dCol`): hash-range bucket of the
    * key, row count, and the sum-mod digest over the content columns
    * (key included — reordered rows digest identically, changed rows
    * don't).
    */
  def summarize(df: DataFrame, key: Column, content: Seq[Column],
      buckets: Long, nCol: String, dCol: String): DataFrame =
    df.select(
        pmod(Hashing.hash64(key.cast("string")), lit(buckets)).as("bucket"),
        (Hashing.hash64(concat_ws("|",
          (key.cast("string") +: content.map(_.cast("string"))): _*))
          % lit(DigestMod)).as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as(nCol),
        (sum(col("h")) % lit(DigestMod)).cast("long").as(dCol))

  /** Diff two summaries (left `n_t1`/`digest_t1`, right `n_t2`/
    * `digest_t2`; right buckets drive): adds `dirty` and `rows_delta`.
    * Buckets absent on the left read as empty (count 0, digest 0).
    */
  def diff(t1: DataFrame, t2: DataFrame): DataFrame =
    t2.join(t1, Seq("bucket"), "left")
      .withColumn("n_t1", coalesce(col("n_t1"), lit(0L)))
      .withColumn("digest_t1", coalesce(col("digest_t1"), lit(0L)))
      .withColumn("dirty",
        col("n_t1") =!= col("n_t2") || col("digest_t1") =!= col("digest_t2"))
      .withColumn("rows_delta", col("n_t2") - col("n_t1"))
}
