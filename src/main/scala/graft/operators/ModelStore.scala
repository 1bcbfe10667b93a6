package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Parquet persistence for trained models — the production complement to
  * [[TrainCache]]: the cache makes training once-per-JVM, the store makes
  * it once-per-CORPUS. At 100 TB a codebook is trained beside the corpus
  * scan that feeds it, persisted next to the index files
  * ([[Ivf.writePartitioned]]'s layout), and every later job — other
  * drivers, other clusters, next week's incremental ingest — loads it
  * instead of re-scanning terabytes to re-derive identical centroids.
  *
  * Round-trips are EXACT: doubles and longs pass through parquet
  * bit-for-bit, so a loaded model embeds into plans as the same literals
  * and produces bit-identical search results / scores (spec-pinned).
  * Writers `coalesce(1)` deliberately — a model is KB-to-MB of driver
  * state, one file per model is the readable layout.
  */
object ModelStore {

  private val vecSchema = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** IVF coarse quantizer → parquet rows (j, centroid vector). */
  def saveIvf(spark: SparkSession, model: Ivf.Model, path: String): Unit = {
    val rows = model.centroids.zipWithIndex
      .map { case (c, j) => Row(j, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), vecSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadIvf(spark: SparkSession, path: String): Ivf.Model =
    Ivf.Model(
      spark.read.parquet(path).collect()
        .sortBy(_.getInt(0))
        .map(_.getSeq[Double](1).toArray))

  private val pqSchema = StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** PQ codebooks → parquet rows (subspace, code, centroid vector). */
  def savePq(spark: SparkSession, model: Pq.Model, path: String): Unit = {
    val rows = for {
      (book, sub) <- model.codebooks.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield Row(sub, code, c.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), pqSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String): Pq.Model = {
    val bySub = spark.read.parquet(path).collect()
      .groupBy(_.getInt(0))
    Pq.Model(
      bySub.keys.toArray.sorted.map { sub =>
        bySub(sub).sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      })
  }

  private val lmSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false), // tri | pre | unseen
    StructField("key", LongType, nullable = false),
    StructField("micros", LongType, nullable = false)))

  /** Char-trigram LM → parquet rows (kind, packed key, NLL micros);
    * `unseen` is the one keyless row.
    */
  def saveLm(spark: SparkSession, model: LmScore.Model, path: String): Unit = {
    val rows =
      model.triMicros.iterator.map { case (k, v) => Row("tri", k, v) } ++
        model.preMicros.iterator.map { case (k, v) => Row("pre", k, v) } ++
        Iterator(Row("unseen", 0L, model.unseenMicros))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), lmSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadLm(spark: SparkSession, path: String): LmScore.Model = {
    val tri = new scala.collection.mutable.LongMap[Long]
    val pre = new scala.collection.mutable.LongMap[Long]
    var unseen = 0L
    spark.read.parquet(path).collect().foreach { r =>
      r.getString(0) match {
        case "tri" => tri.update(r.getLong(1), r.getLong(2))
        case "pre" => pre.update(r.getLong(1), r.getLong(2))
        case _ => unseen = r.getLong(2)
      }
    }
    LmScore.Model(tri, pre, unseen)
  }
}
