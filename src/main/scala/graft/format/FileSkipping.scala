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
    // When parquet truncates BINARY stats (parquet.statistics.truncate
    // .length below the no-truncation default), the stored string max is
    // an incremented prefix — a valid upper BOUND that need not exist in
    // the data. Mark string stats bound-only so exact MIN/MAX refuses
    // them while range pruning (sound against bounds) keeps working.
    val stringBoundsOnly = {
      val len = conf.getInt("parquet.statistics.truncate.length",
        Int.MaxValue)
      len > 0 && len != Int.MaxValue
    }
    val dir = new Path(root, rel)
    val fs = dir.getFileSystem(conf)
    val wanted: Map[String, String] = schema.fields
      .flatMap(f => statDomain(f.dataType).map(d => f.name -> d)).toMap
    // One footer open per file, parallelized ([[CommitLog.parMap]]): a
    // 10k-file compact must not pay 10k SERIAL driver-side opens (each
    // is a round-trip on an object store).
    val files = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CommitLog.parMap(files.toSeq) { st =>
        val fileRel = rel + "/" + st.getPath.getName
        if (wanted.isEmpty) fileRel -> Map.empty[String, ColStats]
        else {
          // per column: (min, max) accumulated over row groups; a column
          // hit by one stat-less row group is dropped
          val acc = scala.collection.mutable.Map[String, (String, String)]()
          val dropped = scala.collection.mutable.Set[String]()
          val seen = scala.collection.mutable.Set[String]()
          // null counts accumulate independently of the min/max domain
          // rules: a column outside the comparable domains still prunes
          // IsNull/IsNotNull if its counts are complete. One stat-less
          // row group poisons the column's count (None).
          val nullAcc = scala.collection.mutable.Map[String, Option[Long]]()
          var rowCount = 0L
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try {
            r.getFooter.getBlocks.forEach { block =>
              rowCount += block.getRowCount
              block.getColumns.forEach { cc =>
                val path = cc.getPath.toDotString
                if (wanted.contains(path) ||
                    schema.fieldNames.contains(path)) {
                  val s0 = cc.getStatistics
                  val cnt =
                    if (s0 != null && !s0.isEmpty && s0.isNumNullsSet)
                      Some(s0.getNumNulls)
                    else None
                  nullAcc(path) = (nullAcc.getOrElse(path, Some(0L)), cnt) match {
                    case (Some(a), Some(b)) => Some(a + b)
                    case _ => None
                  }
                }
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
                    // float/double bounds can legitimately be
                    // Infinity/-Infinity (and NaN-poisoned writers can
                    // emit NaN); those are not decimal-comparable —
                    // drop the column for this file rather than throw
                    // at prune time (ADVICE r12).
                    if (domain == "double" && !(finite(mn) && finite(mx)))
                      dropped += path
                    else acc.get(path) match {
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
          val withRange = (seen -- dropped).iterator.map { c =>
            val (mn, mx) = acc(c)
            c -> ColStats(mn, mx, wanted(c),
              nulls = nullAcc.getOrElse(c, None), rows = Some(rowCount),
              bound = if (stringBoundsOnly && wanted(c) == "string")
                Some(true) else None)
          }.toMap
          // columns with NO usable min/max (all-null, or a domain we
          // don't compare) still ship their counts when complete —
          // that alone prunes IsNull/IsNotNull and, for all-null
          // files, every value predicate
          val countOnly = nullAcc.iterator.collect {
            case (c, Some(n)) if !withRange.contains(c) =>
              c -> ColStats("", "", "null",
                nulls = Some(n), rows = Some(rowCount))
          }.toMap
          fileRel -> (withRange ++ countOnly)
        }
      }.toMap
  } catch { case _: Exception => Map.empty }

  private def finite(s: String): Boolean =
    s != null && s.nonEmpty &&
      !s.contains("Infinity") && !s.contains("NaN")

  /** Unsigned UTF-8 byte order — the comparator parquet used to compute
    * BINARY min/max. UTF-16 `String.compareTo` DISAGREES with it for
    * strings mixing supplementary code points (surrogates D800+ encode
    * code points ≥ U+10000, which sort ABOVE U+E000..U+FFFF in byte
    * order but below in code-unit order), so comparing stats with
    * compareTo can wrongly prune a file (ADVICE r12).
    */
  private def utf8Cmp(a: String, b: String): Int =
    bytesCmp(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
             b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def bytesCmp(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private[format] def cmpInDomain(a: String, b: String, domain: String): Int =
    domain match {
      case "string" => utf8Cmp(a, b)
      case _ => BigDecimal(a).compare(BigDecimal(b))
    }

  /** The filter value's comparison domain, or None → never prune.
    * Floats stay in FLOAT shortest-repr space (`Float.toString`, the
    * same serialization [[footerStats]] used for the stat bounds):
    * widening to double first (`1.1f.toDouble` = 1.100000023841858)
    * makes an equality on a value actually present in the file compare
    * ABOVE the file's max and wrongly prune it (ADVICE r12 high).
    */
  private def valueDomain(v: Any): Option[(BigDecimal, String)] = v match {
    case n: Byte => Some((BigDecimal(n.toInt), "num"))
    case n: Short => Some((BigDecimal(n.toInt), "num"))
    case n: Int => Some((BigDecimal(n), "num"))
    case n: Long => Some((BigDecimal(n), "num"))
    case n: Float if !n.isNaN && !n.isInfinite =>
      Some((BigDecimal(n.toString), "num"))
    case n: Double if !n.isNaN && !n.isInfinite => Some((BigDecimal(n), "num"))
    case _ => None
  }

  // compare a filter value against one stat bound; None = incomparable
  // (including a bound that fails to parse — keep the file, never throw)
  private def cmp(v: Any, bound: String, typ: String): Option[Int] =
    try v match {
      case s: String if typ == "string" => Some(utf8Cmp(s, bound))
      case _ => valueDomain(v).collect {
        case (bd, _) if typ == "long" || typ == "double" =>
          bd.compare(BigDecimal(bound))
      }
    } catch { case _: NumberFormatException => None }

  /** The attribute of a value-comparison filter (ones a null never
    * satisfies), or None for everything else. */
  private def valueAttr(f: Filter): Option[String] = f match {
    case EqualTo(a, _) => Some(a)
    case In(a, _) => Some(a)
    case GreaterThan(a, _) => Some(a)
    case GreaterThanOrEqual(a, _) => Some(a)
    case LessThan(a, _) => Some(a)
    case LessThanOrEqual(a, _) => Some(a)
    case StringStartsWith(a, _) => Some(a)
    case _ => None
  }

  /** Every row of the file is null in this column (counts complete). */
  private def allNull(s: ColStats): Boolean =
    s.nulls.isDefined && s.rows.isDefined && s.nulls == s.rows &&
      s.rows.exists(_ > 0)

  /** True iff `filter` provably matches NO row of a file with `stats`.
    * Unknown columns/ops/domains → false (keep the file).
    */
  def excludes(stats: Map[String, ColStats], filter: Filter): Boolean = {
    def st(a: String) = stats.get(a)
    filter match {
      // null-count pruning: a value predicate matches NOTHING in an
      // all-null file (SQL three-valued logic: null cmp v is never true)
      case f if valueAttr(f).exists(a => st(a).exists(allNull)) => true
      case IsNull(a) => st(a).exists(_.nulls.contains(0L))
      case IsNotNull(a) => st(a).exists(allNull)
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
      case StringStartsWith(a, p) => st(a).exists { s =>
        s.typ == "string" && {
          // byte space throughout (see utf8Cmp): every value < p (max
          // too small), or every value already beyond any p-prefixed
          // string (min's first |bytes(p)| BYTES compare above p —
          // char-based take could split a surrogate pair)
          val utf8 = java.nio.charset.StandardCharsets.UTF_8
          val pb = p.getBytes(utf8)
          val minB = s.min.getBytes(utf8)
          utf8Cmp(s.max, p) < 0 ||
            bytesCmp(java.util.Arrays.copyOf(
              minB, math.min(minB.length, pb.length)), pb) > 0
        }
      }
      case And(l, r) => excludes(stats, l) || excludes(stats, r)
      case Or(l, r) => excludes(stats, l) && excludes(stats, r)
      case _ => false
    }
  }
}
