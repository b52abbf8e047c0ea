package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reads one [[CellImageInputPartition]] (a line slice of one .jsonl file), applying
  * the channel projection and required-column pruning while parsing: pixel arrays are
  * only decoded when `data`/`mask` are in the required schema, and only the selected
  * channels' slices are copied.
  *
  * The jsonl line shape is what [[CellImageJsonl.write]] emits:
  * {"fileId":"...","imageIdx":0,"width":8,"height":8,"nChannels":2,
  *  "data":[...],"mask":[0,1,...]} — flat channel-major arrays (SURVEY.md §1.1).
  */
class CellImagePartitionReader(
    part: CellImageInputPartition,
    requiredSchema: StructType,
    channels: Option[Array[Int]],
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val needData = requiredSchema.fieldNames.contains("data")
  private val needMask = requiredSchema.fieldNames.contains("mask")
  private val src = scala.io.Source.fromFile(part.path)
  private val lines = src.getLines().zipWithIndex
    .dropWhile(_._2 < part.startLine)
    .takeWhile(_._2 < part.endLine)
  private var current: InternalRow = _

  /** Pushed-filter row skip on the cheap header fields only — a non-matching
    * line's pixel arrays are never decoded. */
  private def lineMatches(line: String): Boolean =
    filters.isEmpty || CellImageSource.rowMatches(
      CellImageJsonl.fileIdOf(line), CellImageJsonl.imageIdxOf(line), filters)

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()._1
      if (lineMatches(line)) {
        current = parse(line)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()

  // ---- minimal, allocation-conscious jsonl parsing (fixed field set) ----

  private def parse(line: String): InternalRow = {
    val fileId = strField(line, "fileId")
    val imageIdx = numField(line, "imageIdx").toLong
    val width = numField(line, "width").toInt
    val height = numField(line, "height").toInt
    val nChannels = numField(line, "nChannels").toInt
    val sel = channels.map(_.map(_ - 1)).getOrElse((0 until nChannels).toArray)
    val plane = width * height

    val values = requiredSchema.fields.map { f =>
      f.name match {
        case "fileId" => UTF8String.fromString(fileId)
        case "imageIdx" => imageIdx
        case "width" => width
        case "height" => height
        case "nChannels" => sel.length
        case "data" =>
          val all = doubleArrayField(line, "data")
          ArrayData.toArrayData(selectChannels(all, sel, plane))
        case "mask" =>
          val all = doubleArrayField(line, "mask")
          val sliced = selectChannels(all, sel, plane)
          ArrayData.toArrayData(sliced.map(_ != 0.0))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def selectChannels(all: Array[Double], sel: Array[Int], plane: Int): Array[Double] =
    if (sel.length * plane == all.length && sel.zipWithIndex.forall { case (c, i) => c == i }) all
    else {
      val out = new Array[Double](sel.length * plane)
      var i = 0
      while (i < sel.length) {
        System.arraycopy(all, sel(i) * plane, out, i * plane, plane)
        i += 1
      }
      out
    }

  private def strField(line: String, name: String): String = {
    val k = "\"" + name + "\":\""
    val i = line.indexOf(k)
    require(i >= 0, s"missing $name in $line")
    val start = i + k.length
    line.substring(start, line.indexOf('"', start))
  }

  private def numField(line: String, name: String): Double = {
    val k = "\"" + name + "\":"
    val i = line.indexOf(k)
    require(i >= 0, s"missing $name")
    var j = i + k.length
    val sb = new StringBuilder
    while (j < line.length && (line.charAt(j).isDigit || "+-.eE".indexOf(line.charAt(j)) >= 0)) {
      sb.append(line.charAt(j)); j += 1
    }
    sb.toString.toDouble
  }

  private def doubleArrayField(line: String, name: String): Array[Double] = {
    val k = "\"" + name + "\":["
    val i = line.indexOf(k)
    require(i >= 0, s"missing $name")
    val start = i + k.length
    val end = line.indexOf(']', start)
    val body = line.substring(start, end)
    if (body.isEmpty) Array.empty
    else {
      val parts = body.split(',')
      val out = new Array[Double](parts.length)
      var j = 0
      while (j < parts.length) { out(j) = java.lang.Double.parseDouble(parts(j)); j += 1 }
      out
    }
  }
}

/** Writer for the jsonl fixture layout (test + fixture tooling, not a sink). */
object CellImageJsonl {
  import graft.pipeline.CellImage

  /** fileId of one jsonl line (planning-time whole-file filter skip: a file
    * carries exactly one fileId, so the first line answers for the file). */
  def fileIdOf(line: String): String = {
    val k = "\"fileId\":\""
    val i = line.indexOf(k)
    require(i >= 0, s"missing fileId in $line")
    val start = i + k.length
    line.substring(start, line.indexOf('"', start))
  }

  /** imageIdx of one jsonl line (row-level filter skip before pixel decoding). */
  def imageIdxOf(line: String): Long = {
    val k = "\"imageIdx\":"
    val i = line.indexOf(k)
    require(i >= 0, s"missing imageIdx in $line")
    var j = i + k.length
    var v = 0L
    while (j < line.length && line.charAt(j).isDigit) { v = v * 10 + (line.charAt(j) - '0'); j += 1 }
    // No digits right after the key (whitespace, negative, malformed) must throw,
    // not parse as 0: with pushed imageIdx filters a silent 0 would make
    // rowMatches drop valid rows instead of failing loudly.
    require(j > i + k.length, s"malformed imageIdx in $line")
    v
  }

  def write(dir: java.io.File, fileName: String, images: Seq[CellImage]): Unit = {
    dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, fileName))
    try images.foreach { ci =>
      val data = ci.data.mkString(",")
      val mask = ci.mask.map(b => if (b) "1" else "0").mkString(",")
      w.println(
        s"""{"fileId":"${ci.fileId}","imageIdx":${ci.imageIdx},"width":${ci.width},"height":${ci.height},"nChannels":${ci.nChannels},"data":[$data],"mask":[$mask]}""")
    } finally w.close()
  }
}
