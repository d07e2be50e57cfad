package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side reads of TINY parquet tables (index metadata, takedown
  * sets, k-row center tables) via parquet-hadoop directly — NO Spark
  * job. A Spark read of a one-row table costs a full plan + schedule +
  * task round trip (~100 ms of fixed latency per read on the serving
  * path); the direct read is small-file IO at any corpus size. Callers
  * must only point this at tables that are small BY CONSTRUCTION
  * (one-row-per-mutation deltas that compaction collapses, k-row center
  * tables) or guard with [[dataBytes]] and fall back to a Spark read —
  * on an object store this is O(files) GETs with no task parallelism.
  *
  * File order is the lexicographic file-name sort (deterministic across
  * filesystems, unlike raw listing order).
  */
private[graft] object TinyParquet {

  /** The table's data files, lexicographically sorted. */
  def dataFiles(conf: Configuration, dirStr: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val dirPath = new Path(dirStr)
    val fs = dirPath.getFileSystem(conf)
    if (!fs.exists(dirPath)) Seq.empty
    else fs.listStatus(dirPath).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
  }

  /** Total data bytes of the table (0 when absent) — the caller-side
    * tininess guard.
    */
  def dataBytes(conf: Configuration, dirStr: String): Long =
    dataFiles(conf, dirStr).map(_.getLen).sum

  /** Every row of every data file, in lexicographic file order. */
  def rows(conf: Configuration, dirStr: String): Seq[Group] =
    dataFiles(conf, dirStr).flatMap { st =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), st.getPath)
        .withConf(conf)
        .build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toVector
      finally reader.close()
    }

  /** One long column of a table known to be under `maxBytes` of data —
    * `None` when the table is over the guard (caller falls back to a
    * Spark read) or absent. Missing/null cells are skipped.
    */
  def longsIfTiny(
      conf: Configuration,
      dirStr: String,
      column: String,
      maxBytes: Long = 8L << 20): Option[Array[Long]] = {
    val files = dataFiles(conf, dirStr)
    if (files.isEmpty || files.map(_.getLen).sum > maxBytes) None
    else Some(rows(conf, dirStr).iterator
      .filter(g => g.getType.containsField(column) && g.getFieldRepetitionCount(column) > 0)
      .map(_.getLong(column, 0))
      .toArray)
  }

  /** An `array<double>` cell (Spark's standard 3-level list layout, or
    * a legacy 2-level repeated primitive) — field names are resolved
    * from the schema, not assumed.
    */
  def doubleArray(g: Group, field: String): Array[Double] = {
    val outer = g.getGroup(field, 0)
    val repField = outer.getType.getFields.get(0)
    val repName = repField.getName
    val n = outer.getFieldRepetitionCount(repName)
    if (repField.isPrimitive)
      Array.tabulate(n)(i => outer.getDouble(repName, i))
    else
      Array.tabulate(n) { i =>
        val el = outer.getGroup(repName, i)
        el.getDouble(el.getType.getFields.get(0).getName, 0)
      }
  }
}
