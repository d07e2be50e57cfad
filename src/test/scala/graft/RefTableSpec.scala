package graft

import graft.functions.{BroadcastRef, ColumnBridge, InlineRef, NearestCentroid, RefTable, TopCentroids}
import org.apache.spark.sql.functions._

/** The r10 plan-size contract for native-expression lookup tables:
  * above [[RefTable.InlineByteCap]] the table must stop riding the
  * serialized plan (it would be re-shipped with every stage's task
  * binary) and travel as a torrent broadcast whose plan footprint is
  * a fixed-size stub — with bit-identical results either way.
  */
class RefTableSpec extends SparkSpec {
  import spark.implicits._

  private def javaBytes(o: AnyRef): Int = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.size()
  }

  test("auto: small inline, large broadcast; broadcast stub is plan-size bounded") {
    val small = Array.fill(16)(Array.fill(8)(1.0))
    val sRef = RefTable.auto(spark, small, RefTable.bytes2(small, 8))
    assert(sRef.isInstanceOf[InlineRef[_]])

    // 2048 x 512 doubles = 8 MiB > the 4 MiB cap
    val big = Array.tabulate(2048)(i => Array.tabulate(512)(j => (i * 31 + j).toDouble / 997.0))
    val bRef = RefTable.auto(spark, big, RefTable.bytes2(big, 8))
    assert(bRef.isInstanceOf[BroadcastRef[_]])
    assert(bRef.value eq big, "driver-side value access returns the broadcast table")
    val stub = javaBytes(bRef)
    val inline = javaBytes(InlineRef(big))
    assert(stub < 32 * 1024, s"broadcast stub serialized to $stub bytes — not plan-bounded")
    assert(inline > 4 * 1024 * 1024, s"sanity: inline form carries the table ($inline bytes)")
  }

  test("NearestCentroid and TopCentroids: broadcast table matches inline bit for bit") {
    val k = 64; val dim = 32
    val centers = Array.tabulate(k)(c => {
      val raw = Array.tabulate(dim)(j => math.sin(c * 131 + j * 17))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    })
    val fCenters = centers.map(_.map(_.toFloat))
    val vecs = spark.range(500).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => sin($"id" * 7 + i).cast("float")).as("v"))

    def nearest(ref: RefTable[Array[Array[Double]]]) =
      vecs.withColumn("c", ColumnBridge.toColumn(
          NearestCentroid(ColumnBridge.toExpression($"v"), ref)))
        .select("vec_id", "c").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    def top(ref: RefTable[Array[Array[Float]]]) =
      vecs.withColumn("c", ColumnBridge.toColumn(
          TopCentroids(ColumnBridge.toExpression($"v"), ref, 3)))
        .select("vec_id", "c").collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Int]](1).toVector)).sortBy(_._1)

    val bc = BroadcastRef(spark.sparkContext.broadcast(centers))
    assert(nearest(InlineRef(centers)).toSeq == nearest(bc).toSeq)
    val bcF = BroadcastRef(spark.sparkContext.broadcast(fCenters))
    assert(top(InlineRef(fCenters)).toSeq == top(bcF).toSeq)
  }
}
