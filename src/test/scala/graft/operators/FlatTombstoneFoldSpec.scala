package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}

/** Physical takedown fold for the flat-table ANN families (r12 verdict
  * #6): [[AnnIndex.compactTombstones]] drops tombstoned rows from the
  * per-vector table physically via a frozen-quantizer version swap —
  * after the fold the loaded table is row-identical to the pre-delete
  * table filtered (the TakedownSpec ivfpq identity), the window is
  * empty, the quantizer tables carry over verbatim, and every query
  * result matches the filtered control.
  */
class FlatTombstoneFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val nEmb = Tables.embeddingsRows(spark, sf)
  private val dim = Tables.EmbeddingDim

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"flatfold_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def ids(xs: Seq[Long]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    xs.toDF("vec_id")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val removeSeq = Seq(1L, 7L)

  /** Shared lifecycle: build → delete → fold; assert the physical slab,
    * the window reset, the frozen-quantizer row identity, and the query
    * identity vs the filtered control. */
  private def foldCase(family: String, dir: String,
      vecTable: String, quantTables: Seq[String],
      preVec: DataFrame, postVec: AnnIndex.Manifest => DataFrame,
      query: DataFrame => Seq[String]): Unit = {
    val pre = preVec.persist()
    pre.count()
    val ctlVec = pre.filter(!col("vec_id").isInCollection(removeSeq))
    val preQuant = quantTables.map(t =>
      t -> rows(spark.read.parquet(s"$dir/$t.parquet"))).toMap
    assert(AnnIndex.delete(ids(removeSeq :+ 424242424L), dir)
      == removeSeq.size)
    // fold: tombstones become physical, window empties, version swaps
    val mfc = AnnIndex.compactTombstones(spark, dir)
    assert(mfc.params("tomb_deltas") == 0L && mfc.params("version") == 1L,
      s"$family: fold must empty the window and swap the version")
    assert(mfc.n == nEmb - removeSeq.size)
    // the committed slab itself holds no removed row (not just the view)
    val slab = spark.read.parquet(f"$dir/v-00001/$vecTable.parquet")
    assert(slab.filter(col("vec_id").isInCollection(removeSeq)).isEmpty,
      s"$family: the folded slab must not hold removed vectors")
    // frozen-quantizer identity: folded table ≡ pre-delete table filtered
    assert(rows(postVec(mfc)) == rows(ctlVec),
      s"$family: folded table must equal the filtered pre-delete table")
    // quantizer tables carried over verbatim
    quantTables.foreach(t => assert(
      rows(spark.read.parquet(f"$dir/v-00001/$t.parquet")) == preQuant(t),
      s"$family: $t must carry over the frozen fit"))
    // query identity vs the filtered control
    assert(query(postVec(mfc)) == query(ctlVec),
      s"$family: post-fold queries must match the filtered control")
    // a fold with nothing pending is a no-op (manifest untouched)
    assert(AnnIndex.compactTombstones(spark, dir) == mfc,
      s"$family: an empty-window fold must be a no-op")
    // second lifecycle round on the versioned layout: delete → fold → v2.
    // The superseded v1 is NOT swept at its own commit — it survives one
    // grace cycle for in-flight readers (the rebuild contract) and the
    // NEXT fold's sweep removes it.
    assert(AnnIndex.delete(ids(Seq(3L)), dir) == 1L)
    val mfc2 = AnnIndex.compactTombstones(spark, dir)
    assert(mfc2.params("version") == 2L && mfc2.params("tomb_deltas") == 0L)
    assert(Files.exists(java.nio.file.Paths.get(dir, "v-00001")),
      s"$family: the superseded version keeps one reader-grace cycle")
    assert(rows(postVec(mfc2)) ==
      rows(pre.filter(!col("vec_id").isInCollection(removeSeq :+ 3L))))
    // third round: ITS sweep ends v1's grace; storage stays ≤ 2 versions
    assert(AnnIndex.delete(ids(Seq(5L)), dir) == 1L)
    val mfc3 = AnnIndex.compactTombstones(spark, dir)
    assert(mfc3.params("version") == 3L)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "v-00001")),
      s"$family: the next fold's sweep must end the grace cycle")
    assert(rows(postVec(mfc3)) ==
      rows(pre.filter(!col("vec_id").isInCollection(removeSeq ++ Seq(3L, 5L)))))
    pre.unpersist()
    spark.catalog.clearCache()
  }

  test("lsh: tombstone fold is physical, frozen-mask identical") {
    val dir = tmp("lsh")
    AnnIndex.buildLsh(emb, dir, dim, nEmb)
    foldCase("lsh", dir, "lsh_signatures", Seq.empty,
      spark.read.parquet(s"$dir/lsh_signatures.parquet"),
      _ => AnnIndex.loadLsh(spark, dir).signatures,
      sigs => rows(AnnIndex.lshTopK(AnnIndex.LoadedLsh(
        AnnIndex.readManifest(spark, dir), sigs))))
  }

  test("ivf: tombstone fold is physical, centroids carried verbatim") {
    val dir = tmp("ivf")
    AnnIndex.buildIvf(emb, dir, dim, nEmb)
    foldCase("ivf", dir, "ivf_assign", Seq("ivf_centroids"),
      spark.read.parquet(s"$dir/ivf_assign.parquet"),
      _ => AnnIndex.loadIvf(spark, dir).assign,
      assign => rows(AnnIndex.ivfTopK(AnnIndex.LoadedIvf(
        AnnIndex.readManifest(spark, dir), assign,
        spark.read.parquet(s"$dir/v-00001/ivf_centroids.parquet")))))
  }

  test("pq: tombstone fold is physical, codebook carried verbatim") {
    val dir = tmp("pq")
    AnnIndex.buildPq(emb, dir, dim, nHint = nEmb)
    lazy val cb = AnnIndex.loadPq(spark, dir).codebook
    foldCase("pq", dir, "pq_codes", Seq("pq_codebook"),
      spark.read.parquet(s"$dir/pq_codes.parquet"),
      _ => AnnIndex.loadPq(spark, dir).codes,
      codes => rows(AnnIndex.pqTopK(AnnIndex.LoadedPq(
        AnnIndex.readManifest(spark, dir), codes, cb), emb, nQueries = 4)))
  }

  test("sq8 and ivfpq route elsewhere") {
    val dirSq = tmp("sq8")
    AnnIndex.buildSq(emb, dirSq, dim, nEmb)
    intercept[IllegalArgumentException] {
      AnnIndex.compactTombstones(spark, dirSq)
    }
    val dirPq = tmp("ivfpq_route")
    AnnIndex.buildIvfPq(emb, dirPq, dim, nHint = nEmb)
    intercept[IllegalArgumentException] {
      AnnIndex.compactTombstones(spark, dirPq)
    }
  }
}
