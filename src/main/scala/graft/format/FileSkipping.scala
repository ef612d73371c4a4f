package graft.format

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Manifest-level file skipping (the Delta/Iceberg data-skipping idea,
  * re-expressed for the graft manifest): each base manifest entry
  * carries per-column min/max captured from its parquet footers at
  * write time, and [[GraftRelation]]'s scan drops entries a pushed
  * filter provably excludes BEFORE the snapshot plan is built.
  *
  * Why this matters at 100 TB: parquet row-group pruning still
  * schedules a task per file split and opens every footer; manifest
  * pruning happens on the driver against a few KB of commit metadata,
  * so a selective query over a 10k-file table plans only the surviving
  * files. (Object-store listings are also skipped — the pruned entries
  * are never turned into input paths.)
  *
  * Correctness under merge-on-read: only BASE files are pruned. Update
  * files carry FULL rows and win last-wins against the base, so a base
  * row whose update satisfies the filter still appears (the update row
  * is scanned); a base row whose update does NOT satisfy it is removed
  * by the re-applied filter above the scan. Tombstones only remove
  * rows. Renames disable pruning wholesale (stats are keyed by the
  * names at write time — [[GraftDataset.pruneBaseFiles]] guards this).
  *
  * Conservativeness: a column with any unstatted row group, a type
  * outside long/double/string domains (decimal/date/timestamp excluded
  * on purpose — their footer encodings need logical-type decoding), or
  * any comparison across domains keeps the file. Null semantics: stats
  * ignore nulls, so IsNull/IsNotNull never prune.
  */
object FileSkipping {

  /** Files pruned since JVM start (test instrumentation, same pattern
    * as [[CommitLog.commitReads]]). */
  val prunedFiles = new java.util.concurrent.atomic.AtomicLong

  /** Spark types whose parquet footer stats we trust WITHOUT
    * logical-type decoding. */
  private def statDomain(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case FloatType | DoubleType => Some("double")
    case StringType => Some("string")
    case _ => None
  }

  /** PER-FILE footer stats for every parquet file of one manifest entry
    * (a directory one `df.write` produced), keyed `rel/fileName`. Every
    * parquet file gets a key — an empty inner map marks "file present,
    * no usable stats" so file-granular pruning can tell "not statted"
    * from "not a member". A column with any stat-less row group is
    * dropped from that file's map. Empty result (never a throw) when
    * anything is off — absence of stats just means "never prune".
    *
    * Per-file granularity is what makes [[GraftDataset.compact]] with
    * `clusterBy` a Z-order-lite: range-repartitioned output files cover
    * disjoint key ranges, so a selective filter prunes all but the
    * covering files of ONE manifest entry.
    */
  def footerStats(spark: SparkSession, root: String, rel: String,
                  schema: StructType): Map[String, Map[String, ColStats]] =
  try {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(root, rel)
    val fs = dir.getFileSystem(conf)
    val wanted: Map[String, String] = schema.fields
      .flatMap(f => statDomain(f.dataType).map(d => f.name -> d)).toMap
    fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val fileRel = rel + "/" + st.getPath.getName
        if (wanted.isEmpty) fileRel -> Map.empty[String, ColStats]
        else {
          // per column: (min, max) accumulated over row groups; a column
          // hit by one stat-less row group is dropped
          val acc = scala.collection.mutable.Map[String, (String, String)]()
          val dropped = scala.collection.mutable.Set[String]()
          val seen = scala.collection.mutable.Set[String]()
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try {
            r.getFooter.getBlocks.forEach { block =>
              block.getColumns.forEach { cc =>
                val path = cc.getPath.toDotString
                wanted.get(path).foreach { domain =>
                  seen += path
                  val s = cc.getStatistics
                  val ok = s != null && !s.isEmpty && s.hasNonNullValue &&
                    (cc.getPrimitiveType.getPrimitiveTypeName match {
                      case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
                        domain == "long"
                      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                        domain == "double"
                      case PrimitiveTypeName.BINARY => domain == "string"
                      case _ => false
                    })
                  if (!ok) dropped += path
                  else {
                    val (mn, mx) = cc.getPrimitiveType.getPrimitiveTypeName match {
                      case PrimitiveTypeName.BINARY =>
                        (s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                           .toStringUsingUTF8,
                         s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                           .toStringUsingUTF8)
                      case _ =>
                        (s.genericGetMin.toString, s.genericGetMax.toString)
                    }
                    acc.get(path) match {
                      case None => acc(path) = (mn, mx)
                      case Some((m0, m1)) =>
                        val lo = if (cmpInDomain(mn, m0, domain) < 0) mn else m0
                        val hi = if (cmpInDomain(mx, m1, domain) > 0) mx else m1
                        acc(path) = (lo, hi)
                    }
                  }
                }
              }
            }
          } finally r.close()
          fileRel -> (seen -- dropped).iterator.map { c =>
            val (mn, mx) = acc(c)
            c -> ColStats(mn, mx, wanted(c))
          }.toMap
        }
      }.toMap
  } catch { case _: Exception => Map.empty }

  private def cmpInDomain(a: String, b: String, domain: String): Int =
    domain match {
      case "string" => a.compareTo(b)
      case _ => BigDecimal(a).compare(BigDecimal(b))
    }

  /** The filter value's comparison domain, or None → never prune. */
  private def valueDomain(v: Any): Option[(BigDecimal, String)] = v match {
    case n: Byte => Some((BigDecimal(n.toInt), "num"))
    case n: Short => Some((BigDecimal(n.toInt), "num"))
    case n: Int => Some((BigDecimal(n), "num"))
    case n: Long => Some((BigDecimal(n), "num"))
    case n: Float if !n.isNaN => Some((BigDecimal(n.toDouble), "num"))
    case n: Double if !n.isNaN => Some((BigDecimal(n), "num"))
    case _ => None
  }

  // compare a filter value against one stat bound; None = incomparable
  private def cmp(v: Any, bound: String, typ: String): Option[Int] =
    v match {
      case s: String if typ == "string" => Some(s.compareTo(bound))
      case _ => valueDomain(v).collect {
        case (bd, _) if typ == "long" || typ == "double" =>
          bd.compare(BigDecimal(bound))
      }
    }

  /** True iff `filter` provably matches NO row of a file with `stats`.
    * Unknown columns/ops/domains → false (keep the file).
    */
  def excludes(stats: Map[String, ColStats], filter: Filter): Boolean = {
    def st(a: String) = stats.get(a)
    filter match {
      case EqualTo(a, v) => st(a).exists(s =>
        cmp(v, s.min, s.typ).exists(_ < 0) ||
          cmp(v, s.max, s.typ).exists(_ > 0))
      case In(a, vs) => vs != null && vs.nonEmpty &&
        vs.forall(v => excludes(stats, EqualTo(a, v)))
      case GreaterThan(a, v) => st(a).exists(s =>
        cmp(v, s.max, s.typ).exists(_ >= 0))
      case GreaterThanOrEqual(a, v) => st(a).exists(s =>
        cmp(v, s.max, s.typ).exists(_ > 0))
      case LessThan(a, v) => st(a).exists(s =>
        cmp(v, s.min, s.typ).exists(_ <= 0))
      case LessThanOrEqual(a, v) => st(a).exists(s =>
        cmp(v, s.min, s.typ).exists(_ < 0))
      case StringStartsWith(a, p) => st(a).exists(s =>
        s.typ == "string" &&
          // every value < p (max too small) or every value has a prefix
          // > p (min's first |p| chars already beyond p)
          (s.max.compareTo(p) < 0 || s.min.take(p.length).compareTo(p) > 0))
      case And(l, r) => excludes(stats, l) || excludes(stats, r)
      case Or(l, r) => excludes(stats, l) && excludes(stats, r)
      case _ => false
    }
  }
}
