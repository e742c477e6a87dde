package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DATASOURCE V2 reader for the REFERENCE ENGINE'S OWN on-disk index
  * format — the interop path that lets a user of the reference point
  * this engine at an existing `./index/` directory and query it without
  * conversion. The format (`/root/reference/helper_reduce.c:238-256`):
  * 26 text files named `a`…`z`, one posting per line, `term doc count`
  * space-separated, routed by the term's first letter.
  *
  * The source implements the full V2 pushdown surface:
  *  - `SupportsPushDownFilters`: `term = 'x…'` / `term IN (…)` /
  *    `term LIKE 'x%'` conjuncts prune to the matching LETTER FILES at
  *    planning time — `planInputPartitions` simply never lists the other
  *    25 files, the exact seek the reference hand-codes
  *    (`helper_reduce.c:291` opens `./index/<c>` for a query). All
  *    filters are also returned as residuals so Spark re-applies them —
  *    pruning is a superset optimization, never a correctness gamble.
  *  - `SupportsPushDownRequiredColumns`: per-line parsing materializes
  *    only the projected columns.
  *
  * One InputPartition per (surviving) letter file mirrors the format's
  * own parallelism cap: the reference serializes each letter through one
  * file, so a letter is the natural split unit (a 100 TB deployment
  * would shard WITHIN letters — but then it wouldn't be this format).
  */
class RefIndexSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RefIndexSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RefIndexTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft ref-index source requires option(\"path\", dir)")))

  override def supportsExternalMetadata(): Boolean = true
}

object RefIndexSource {
  val schema: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", LongType, nullable = false)))

  /** First code point of each letter implied by a term-equality-ish
    * filter, or None when the filter gives no letter bound.
    */
  private[v2] def lettersOf(f: Filter): Option[Set[String]] = {
    def firstCp(s: String): Option[String] =
      if (s == null || s.isEmpty) None
      else Some(s.substring(0, s.offsetByCodePoints(0, 1)))
    f match {
      case EqualTo("term", v: String) => firstCp(v).map(Set(_))
      case StringStartsWith("term", p) => firstCp(p).map(Set(_))
      case In("term", vs) =>
        val ls = vs.toSeq.map {
          case s: String => firstCp(s)
          case _ => None
        }
        // one unboundable element (empty/null/non-string) voids the set
        if (ls.exists(_.isEmpty)) None else Some(ls.flatten.toSet)
      case _ => None
    }
  }
}

class RefIndexTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_ref_index($path)"
  override def schema(): StructType = RefIndexSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RefIndexScanBuilder(path)
}

class RefIndexScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var letterSets: Seq[Set[String]] = Seq.empty
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RefIndexSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val derived = filters.flatMap(f => RefIndexSource.lettersOf(f).map(f -> _))
    letterSets = derived.map(_._2).toSeq
    pushed = derived.map(_._1)
    filters // every filter stays a residual — Spark re-applies them all
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // conjunction of filters → intersection of their letter supersets
    val letters = letterSets.reduceOption(_ intersect _)
    new RefIndexScan(path, letters, required)
  }
}

class RefIndexScan(path: String, letters: Option[Set[String]],
                   required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_ref_index path=$path prunedLetters=${letters.map(_.toSeq.sorted.mkString(",")).getOrElse("*")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.length == 1)
      .filter(f => letters.forall(_.contains(f.getName)))
      .sortBy(_.getName)
      .map(f => RefIndexInputPartition(f.getAbsolutePath): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RefIndexReaderFactory(required)
}

case class RefIndexInputPartition(file: String) extends InputPartition

class RefIndexReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RefIndexPartitionReader(
      partition.asInstanceOf[RefIndexInputPartition].file, required)
}

/** Streams one letter file line by line; `term doc count` parsed with
  * zero intermediate allocation beyond the projected values.
  */
class RefIndexPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new java.io.FileInputStream(file),
      java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    if (line == null) { false }
    else {
      val s1 = line.indexOf(' ')
      val s2 = line.indexOf(' ', s1 + 1)
      require(s1 > 0 && s2 > s1,
        s"malformed ref-index line in $file: '$line'")
      val values = required.fieldNames.map {
        case "term"   => UTF8String.fromString(line.substring(0, s1))
        case "doc_id" => line.substring(s1 + 1, s2).toLong
        case "tf"     => line.substring(s2 + 1).trim.toLong
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
