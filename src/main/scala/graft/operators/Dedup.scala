package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing

/** Deduplication family for training-data curation.
  *
  * Scale posture: NONE of these do an O(n²) cross join. Candidate
  * pairs always come from an equi-join on a bucket key (content hash,
  * min-shingle, LSH band, SimHash value, label bucket), so at 100 TB
  * each variant is shuffle-on-bucket + within-bucket pair check —
  * the standard MinHash-LSH banding construction.
  *
  * All hashes are [[Hashing.hash64]] (md5-derived) so the DuckDB
  * oracle reproduces them bit-for-bit.
  */
object Dedup {

  /** Word 3-gram shingle set (distinct), for docs with ≥3 tokens. */
  def shingles(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))

  val MinhashK = 16
  val Bands = 4
  val RowsPerBand = 4 // MinhashK / Bands

  /** MinHash signature: k independent md5-derived hash families,
    * sig(k) = min over shingles of hash64(k || '|' || shingle).
    */
  def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(MinhashK - 1)),
      k => array_min(transform(sh, x => Hashing.hash64(concat_ws("|", k, x)))))

  /** Per-doc docs → (doc_id, shingles) with ≥3-token filter. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shingles(col("toks")).as("sh"))

  val SimhashBits = 24

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: content-hash groupBy, keeper = min id
    "dd01_exact" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Hashing.hash64(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .select(col("keeper"), col("n_copies"))
        .orderBy(col("keeper"))
    },

    // n-gram Jaccard near-dup: min-shingle bucket candidates, exact J
    "dd02_ngram_jaccard" -> { (s, d) =>
      val ds = docShingles(s, d)
        .withColumn("bucket", array_min(transform(col("sh"), x => Hashing.hash64(x))))
      val a = ds.select(col("bucket"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = ds.select(col("bucket"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.join(b, Seq("bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", graft.functions.Det.trunc4(
          col("n_common").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_common"))))
        .filter(col("jaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash + banded LSH candidate pairs
    "dd03_minhash_lsh" -> { (s, d) =>
      val sig = docShingles(s, d).withColumn("sig", minhashSig(col("sh")))
      val banded = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)), bIdx =>
          Hashing.hash64(concat_ws(",",
            (0 until RowsPerBand).map(r =>
              element_at(col("sig"), bIdx * RowsPerBand + r + 1)): _*)))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")
      val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
      l.join(r, Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared_bands"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // SimHash over distinct-token hashes
    "dd04_simhash" -> { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(split(trim(col("text")), "\\s+"))).as("token"))
        .withColumn("h", Hashing.hash64(col("token")))
      val bitSums = (0 until SimhashBits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b"))
      val agged = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val simhash = (0 until SimhashBits).map(b =>
        when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      agged.select(col("doc_id"), simhash.as("simhash"))
        .orderBy(col("doc_id"))
    },

    // embedding-cosine near-dup within label buckets
    "dd05_embed_cosine" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("norm", sqrt(aggregate(
          transform(col("emb"), x => x * x), lit(0.0), (acc, x) => acc + x)))
      val a = e.select(col("label"), col("vec_id").as("vec_a"), col("emb").as("emb_a"), col("norm").as("norm_a"))
      val b = e.select(col("label"), col("vec_id").as("vec_b"), col("emb").as("emb_b"), col("norm").as("norm_b"))
      a.join(b, Seq("label"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("dot", aggregate(
          zip_with(col("emb_a"), col("emb_b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
        .withColumn("cos_sim", graft.functions.Det.trunc4(col("dot") / (col("norm_a") * col("norm_b"))))
        .filter(col("cos_sim") >= 0.5)
        .select(col("label"), col("vec_a"), col("vec_b"), col("cos_sim"))
        .orderBy(col("label"), col("vec_a"), col("vec_b"))
    }
  )

  private val duckToks = """string_split_regex(trim(text), '\s+')"""
  private val duckSh =
    s"""list_distinct(list_transform(range(len($duckToks) - 2),
       | i -> $duckToks[i+1] || ' ' || $duckToks[i+2] || ' ' || $duckToks[i+3]))""".stripMargin
  private val duckNorm =
    "sqrt(list_sum(list_transform(emb, x -> x * x)))"

  def oracles: Map[String, String] = Map(
    "dd01_exact" ->
      s"""SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies FROM (
         |  SELECT doc_id,
         |    ${Hashing.duckHash64("lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")} AS fp
         |  FROM documents)
         |GROUP BY fp ORDER BY keeper""".stripMargin,

    "dd02_ngram_jaccard" ->
      s"""WITH ds AS (
         |  SELECT doc_id, sh,
         |    list_min(list_transform(sh, x -> ${Hashing.duckHash64("x")})) AS bucket
         |  FROM (SELECT doc_id, $duckSh AS sh FROM documents
         |        WHERE len($duckToks) >= 3))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) * 10000) / 10000 AS jaccard
         |FROM ds a JOIN ds b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) * 10000) / 10000 >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dd03_minhash_lsh" -> {
      val sigExprs = (0 until MinhashK).map(k =>
        s"list_min(list_transform(sh, x -> ${Hashing.duckHash64(s"'$k' || '|' || x")})) AS sig_$k")
        .mkString(",\n    ")
      val bandRows = (0 until Bands).map { b =>
        val parts = (0 until RowsPerBand).map(r => s"CAST(sig_${b * RowsPerBand + r} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, ${Hashing.duckHash64(s"($parts)")} AS band_hash FROM sigs"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH sh_t AS (
         |  SELECT doc_id, $duckSh AS sh FROM documents
         |  WHERE len($duckToks) >= 3),
         |sigs AS (
         |  SELECT doc_id,
         |    $sigExprs
         |  FROM sh_t),
         |banded AS (
         |  $bandRows)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin
    },

    "dd04_simhash" -> {
      val bitSums = (0 until SimhashBits).map(b =>
        s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b").mkString(",\n    ")
      val shExpr = (0 until SimhashBits).map(b =>
        s"CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""SELECT doc_id, CAST($shExpr AS BIGINT) AS simhash FROM (
         |  SELECT doc_id,
         |    $bitSums
         |  FROM (
         |    SELECT doc_id, ${Hashing.duckHash64("token")} AS h FROM (
         |      SELECT doc_id, unnest(list_distinct($duckToks)) AS token
         |      FROM documents))
         |  GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "dd05_embed_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, emb, $duckNorm AS norm
         |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings))
         |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  floor((list_sum(list_transform(range(len(a.emb)),
         |          i -> a.emb[i+1] * b.emb[i+1])) / (a.norm * b.norm)) * 10000) / 10000 AS cos_sim
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE floor((list_sum(list_transform(range(len(a.emb)),
         |          i -> a.emb[i+1] * b.emb[i+1])) / (a.norm * b.norm)) * 10000) / 10000 >= 0.5
         |ORDER BY a.label, vec_a, vec_b""".stripMargin
  )
}
