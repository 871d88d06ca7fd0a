package graft.load

import graft.core._
import graft.meta._
import graft.validate.{FileValidator, TimeSeriesValidator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import scala.jdk.CollectionConverters._

/** Loaded-corpus result (reference FileDataFrame.get_dataframe +
  * concat_metadata, load_file.py:1863-1878).
  */
final case class LoadedSeries(
    df: DataFrame,
    files: Seq[FileMetadata],
    timestampColumn: Option[String],
    errors: ErrorCollector,
    discoveryStats: Option[DiscoveryStats],
    // the ONE context map threaded through the whole PostProcessingHook
    // chain (reference ts_extensions.py:58-75): hooks see each other's
    // entries and callers read accumulated stats (e.g.
    // processing_stats.outliers_removed) after load
    hookContext: Map[String, Any] = Map.empty
) {
  /** A4 concat metadata. The reference computes end_time with min() — a bug
    * (load_file.py:1873-1875); we implement the documented max().
    */
  def concatMetadata: Map[String, Any] = Map(
    "total_files" -> files.size,
    "start_time" -> files.flatMap(_.startTime).sortBy(_.getTime).headOption,
    "end_time" -> files.flatMap(_.endTime).sortBy(_.getTime).lastOption,
    "size_in_bytes" -> df.queryExecution.optimizedPlan.stats.sizeInBytes
  )

  private def tsColOrThrow: String = timestampColumn.getOrElse(
    throw new TimeValidationException("no timestamp column detected"))

  /** Reference analyze_time_series_continuity (load_file.py:2024-2125) as a
    * method on the loaded corpus.
    */
  def analyzeContinuity(
      expectedFrequency: Option[String] = None,
      minGapSize: String = "1min"
  ): graft.ts.Continuity.ContinuityReport =
    graft.ts.Continuity.analyze(df, tsColOrThrow,
      expectedFrequency.map(graft.core.Offsets.parse),
      graft.core.Offsets.parse(minGapSize))

  /** Reference resample_time_series (load_file.py:2241-2360) as a method on
    * the loaded corpus; original frame untouched.
    */
  def resample(
      frequency: String,
      methodResample: Option[String] = None,
      methodFill: Option[String] = None,
      fillLimit: Option[Int] = None,
      includeAllGaps: Boolean = true,
      maxGapSize: Option[String] = None
  ): DataFrame =
    graft.ts.Resample.resampleTimeSeries(df, tsColOrThrow, frequency,
      methodResample, methodFill, fillLimit, includeAllGaps, maxGapSize)

  /** Reference generate_time_series_report (load_file.py:1023-1102). */
  def fileReport(config: TimeSeriesConfig = TimeSeriesConfig()): graft.meta.FileReport.TimeSeriesFileReport =
    graft.meta.FileReport.generate(files, config)
}

/** The flagship pipeline (reference FileDataFrame.initialize_processing,
  * load_file.py:1263-1323): discover -> extract metadata -> validate
  * sequence -> load CSVs -> coerce -> attach metadata -> union -> parse
  * timestamps -> sort -> clean names -> hooks.
  *
  * Spark-first shape (NOT the reference's per-file pandas loop):
  *   - steps 1-3 are metadata-plane and stay on the driver (file listing is
  *     driver work in Spark too); row data NEVER lands on the driver;
  *   - the read is ONE multi-path csv scan with an enforced schema (so
  *     Catalyst sees a single scan node: column pruning, limit pushdown and
  *     partition-level parallelism all apply), not N unioned per-file plans
  *     whose lineage would grow O(files);
  *   - per-file constants (source_file, file_start_time, file_end_time)
  *     attach via a BROADCAST join on input_file_name() against the tiny
  *     metadata table — no shuffle;
  *   - the optional global time sort is the only wide exchange.
  */
class TimeSeriesLoader(
    spark: SparkSession,
    discovery: FileDiscoveryConfig = FileDiscoveryConfig(),
    loading: LoadingConfig = LoadingConfig(),
    naming: ColumnNamingConfig = ColumnNamingConfig(),
    tsConfig: TimeSeriesConfig = TimeSeriesConfig(),
    extractor: MetadataExtractor = new TimeMetadataExtractor(),
    fileFilter: Option[FileFilter] = None,
    contentValidator: Option[FileValidator] = None,
    transformer: DataTransformer = new DefaultDataTransformer(),
    hooks: Seq[PostProcessingHook] = Nil,
    sortByTimestamp: Boolean = true,
    enforceStructure: Boolean = true
) {
  private val errors = new ErrorCollector

  private def filt: FileFilter =
    fileFilter.getOrElse(new MetadataFileFilter(extractor))

  /** Steps 1-3: discovery + metadata + sequence validation. */
  def discoverAndValidate(basePath: String): (Seq[FileMetadata], DiscoveryStats) = {
    val res = Discovery.discover(basePath, discovery, filt, contentValidator)
    val metas = Discovery.extractAll(res.files, extractor, errors)
    validateSequence(metas)
    (metas, res.stats)
  }

  private def validateSequence(metas: Seq[FileMetadata]): Unit = {
    val validator = new TimeSeriesValidator(tsConfig)
    val verdict = validator.isValidSequence(metas)
    if (!verdict.isValid) {
      errors.add(ProcessingError(
        verdict.errorMessage.getOrElse("time-series validation failed"),
        ErrorSeverity.Critical, "TimeValidationError"))
      if (tsConfig.failOnValidationError)
        throw new TimeValidationException(verdict.errorMessage.getOrElse("invalid sequence"))
    }
  }

  /** Full pipeline from a directory. */
  def load(basePath: String): LoadedSeries = {
    val (metas, stats) = discoverAndValidate(basePath)
    loadFiles(metas, Some(stats))
  }

  /** Full pipeline from an explicit file list (S2). */
  def loadPaths(paths: Seq[String]): LoadedSeries = {
    val res = Discovery.fromFiles(paths, filt, contentValidator)
    val metas = Discovery.extractAll(res.files, extractor, errors)
    validateSequence(metas)
    loadFiles(metas, Some(res.stats))
  }

  /** In-memory uploads (S3): batch source from (name, bytes) pairs. */
  def loadUploads(uploads: Seq[(String, Array[Byte])]): LoadedSeries = {
    import spark.implicits._
    val valid = Discovery.fromUploads(uploads, extractor)
    val metas = valid.map { case (name, _) =>
      scala.util.Try(extractor.extractMetadata(Paths.get(name)))
        .getOrElse(FileMetadata(name))
    }
    validateSequence(metas)
    val perFile = valid.zip(metas).map { case ((name, bytes), meta) =>
      val lines = new String(bytes, loading.encoding).linesIterator.toSeq
      val ds = spark.createDataset(lines)
      val raw = csvReader().csv(ds)
      finishOne(raw, meta)
    }
    assemble(perFile, metas, None)
  }

  private def csvReader() =
    spark.read
      .option("sep", loading.delimiter)
      .option("header", "true")
      .option("encoding", loading.encoding)
      .option("mode", "PERMISSIVE")

  /** S5: header of the first file without reading data (manual limit
    * pushdown, reference nrows=0 at load_file.py:1727).
    */
  def originalColumnNames(path: String): Seq[String] = headerOf(Paths.get(path))

  private def headerOf(p: Path): Seq[String] = {
    val s = Files.lines(p)
    try {
      val it = s.iterator()
      if (!it.hasNext) throw new DataLoadingException(s"File is empty: $p")
      it.next().split(java.util.regex.Pattern.quote(loading.delimiter)).map(_.trim).toSeq
    } finally s.close()
  }

  /** P5: per-file header + dtype enforcement against file #1 (reference
    * load_file.py:1489-1531: column mismatch at :1513-1522, np.issubdtype
    * dtype mismatch at :1525-1531). Header/probe reads only — metadata-plane
    * cost, the data itself is scanned exactly once, later. Returns every
    * file's ordered header: a file with the same column SET in a different
    * ORDER is legal (pandas concat aligns by name) but must get its own
    * positional schema at read time — see loadFiles.
    */
  private def enforceHeaders(metas: Seq[FileMetadata]): Seq[Seq[String]] = {
    val headers = metas.map(m => headerOf(Paths.get(m.filepath)))
    val ref = headers.head
    if (enforceStructure) {
      val refNumeric = ref.zip(probeNumeric(Paths.get(metas.head.filepath), ref.size)).toMap
      metas.tail.zip(headers.tail).foreach { case (m, h) =>
        if (h.toSet != ref.toSet) {
          val msg = s"Column mismatch in ${m.filepath}: expected ${ref.mkString(",")} got ${h.mkString(",")}"
          errors.add(ProcessingError(msg, ErrorSeverity.Error, "DataLoadingError", Some(m.filepath)))
          throw new DataLoadingException(msg)
        }
        val thisNumeric = probeNumeric(Paths.get(m.filepath), h.size)
        // compare BY NAME (not position): reordered files align by name at
        // read time, so only a column flipping numeric<->non-numeric under
        // its own name is the reference's "Data type mismatch"
        h.zip(thisNumeric).foreach { case (cname, tn) =>
          (refNumeric(cname), tn) match {
            case (Some(a), Some(b)) if a != b =>
              val msg = s"Data type mismatch in ${m.filepath}: column '$cname'"
              errors.add(ProcessingError(msg, ErrorSeverity.Error, "DataLoadingError", Some(m.filepath)))
              throw new DataLoadingException(msg)
            case _ => () // no data observed on one side -> cannot judge
          }
        }
      }
    }
    headers
  }

  /** Per-column numeric-ness from the first `probeRows` data lines:
    * Some(true)=all non-empty values parse as double, Some(false)=some
    * don't, None=no data observed. Bounded read (limit-pushdown probe).
    */
  private def probeNumeric(p: Path, nCols: Int, probeRows: Int = 10): Seq[Option[Boolean]] = {
    val sep = java.util.regex.Pattern.quote(loading.delimiter)
    val dec = java.util.regex.Pattern.quote(loading.decimal)
    val s = Files.lines(p)
    try {
      val rows = s.iterator().asScala.drop(1).take(probeRows)
        .map(_.split(sep, -1).map(_.trim).padTo(nCols, "")).toVector
      (0 until nCols).map { i =>
        val vals = rows.map(_(i)).filter(_.nonEmpty)
        if (vals.isEmpty) None
        else Some(vals.forall(v =>
          scala.util.Try(v.replaceAll(dec, ".").toDouble).isSuccess))
      }
    } finally s.close()
  }

  private def detectTimestampColumn(header: Seq[String]): Option[String] =
    loading.timestampColumn.orElse(header.find(_.toLowerCase.contains("time")))

  /** Steps 4+: one scan per distinct header ordering (one scan, period, in
    * the overwhelmingly common identical-headers case) + broadcast metadata
    * attach. A positional schema over a REORDERED file would silently
    * misassign values (the reference's pandas concat aligns by name), so
    * files are grouped by their exact ordered header and each group reads
    * with its own schema before a by-name union.
    */
  def loadFiles(metas: Seq[FileMetadata], stats: Option[DiscoveryStats]): LoadedSeries = {
    import spark.implicits._
    require(metas.nonEmpty, "no files to load")
    val headers = enforceHeaders(metas)
    val tsColRaw = detectTimestampColumn(headers.head)

    // group by ordered header, preserving first-appearance order so the
    // result's column order is file #1's order (pandas concat parity)
    val grouped: Seq[(Seq[String], Seq[String])] = headers.distinct.map { h =>
      (h, metas.zip(headers).collect { case (m, hh) if hh == h => m.filepath })
    }
    // all-string schema: coercion below reproduces to_numeric(errors=coerce)
    val raw = grouped
      .map { case (h, paths) =>
        val schema = StructType(h.map(c => StructField(c, StringType, nullable = true)))
        csvReader().schema(schema).csv(paths: _*)
      }
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

    // per-file metadata via broadcast join (no shuffle, no O(files) plan).
    // Join key is the NORMALIZED plain path: input_file_name() yields a
    // URL-encoded URI ("file:///a/b%20c.csv") while File.toURI gives
    // "file:/a/b c.csv" — raw strings never match. url_decode alone is
    // FORM-decoding ('+' -> space, stray '%' throws under ANSI); protect
    // '+' first and fall back to the raw name on undecodable input.
    val metaDf = broadcast(
      metas
        .map(m => (new java.io.File(m.filepath).getAbsolutePath,
          new java.io.File(m.filepath).getName,
          m.startTime.orNull, m.endTime.orNull))
        .toDF("__path", "source_file", "file_start_time", "file_end_time")
    )
    val decodedName = coalesce(
      expr("""try_url_decode(regexp_replace(input_file_name(), '\\+', '%2B'))"""),
      input_file_name())
    val withMeta = raw
      .withColumn("__path", regexp_replace(decodedName, "^file:/+", "/"))
      .join(metaDf, Seq("__path"), "left")
      .drop("__path")

    val transformed = applyTransform(withMeta, tsColRaw)
    assemble(Seq(transformed), metas, stats, alreadyUnioned = true, tsColRaw)
  }

  private def finishOne(raw: DataFrame, meta: FileMetadata): DataFrame = {
    val tsColRaw = detectTimestampColumn(raw.columns.toSeq)
    applyTransform(transformer.transform(raw, tsColRaw, meta), tsColRaw, skipTransformer = true)
  }

  private def applyTransform(
      df: DataFrame,
      tsColRaw: Option[String],
      skipTransformer: Boolean = false
  ): DataFrame = {
    val metaCols = Set("source_file", "file_start_time", "file_end_time")
    val base =
      if (skipTransformer) df
      else {
        // inline DefaultDataTransformer semantics over the single scan;
        // try_cast = pd.to_numeric(errors="coerce"): garbage -> null (plain
        // cast THROWS under Spark 4 ANSI mode). Non-"." decimal separators
        // (e.g. European "21,5") normalize before the cast (survey §7.4 #8).
        def numeric(c: org.apache.spark.sql.Column) =
          if (loading.decimal == ".") c.try_cast("double")
          else regexp_replace(c,
            java.util.regex.Pattern.quote(loading.decimal), ".").try_cast("double")
        df.columns.foldLeft(df) { (acc, c) =>
          if (tsColRaw.contains(c) || metaCols(c)) acc
          else acc.withColumn(c, numeric(col(c)))
        }
      }
    tsColRaw match {
      case Some(tc) if base.schema(tc).dataType == StringType =>
        // F1 strict parse with F2-style coalesce fallback over common formats
        base.withColumn(tc, parseTimestamp(col(tc)))
      case _ => base
    }
  }

  /** F1/F2: strict format first, then an ordered coalesce of common formats
    * (the Spark-native, codegen'd replacement for the reference's per-row
    * dateparser.parse fallback — its acknowledged hot spot,
    * load_file.py:1932-1955). The configured dateOrder (reference
    * DATE_ORDER, load_file.py:1945,1976) decides which slashed-numeric
    * family wins on ambiguous inputs like 01/02/2024.
    */
  private def parseTimestamp(c: org.apache.spark.sql.Column) = {
    val slashed = loading.dateOrder.toUpperCase match {
      case "MDY" => Seq(
        "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm", "MM/dd/yyyy",
        "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy")
      case "YMD" => Seq(
        "yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd HH:mm", "yyyy/MM/dd",
        "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy")
      case _ => Seq( // DMY (reference default)
        "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd/MM/yyyy",
        "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm", "MM/dd/yyyy")
    }
    val fallbacks = (Seq(
      loading.timeFormat,
      "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd") ++
      slashed ++
      Seq("MM-dd-yyyy HH:mm:ss", "yyyy/MM/dd HH:mm:ss")).distinct
    coalesce(fallbacks.map(f => try_to_timestamp(trim(c), lit(f))): _*)
  }

  private def assemble(
      parts: Seq[DataFrame],
      metas: Seq[FileMetadata],
      stats: Option[DiscoveryStats],
      alreadyUnioned: Boolean = false,
      tsColKnown: Option[String] = None
  ): LoadedSeries = {
    val unioned =
      if (alreadyUnioned) parts.head
      else parts.reduce(_.unionByName(_)) // U1; schemas pre-validated equal

    // O1: timestamp detection + global sort
    val tsCol = tsColKnown.orElse(
      unioned.columns.find(c =>
        c.toLowerCase.contains("time") && !Set("file_start_time", "file_end_time")(c) &&
          unioned.schema(c).dataType == TimestampType)
    )
    val sorted = (tsCol, sortByTimestamp) match {
      case (Some(tc), true) => unioned.orderBy(col(tc))
      case _ => unioned
    }

    val renamed = applyNaming(sorted)
    val tsRenamed = tsCol.map(cleanName)
    // one accumulating context shared by every hook in the chain (reference
    // threads a single dict, ts_extensions.py:58-75, load_file.py:1853-1861)
    val context = scala.collection.mutable.Map.empty[String, Any]
    val hooked = hooks.foldLeft(renamed) { (acc, h) =>
      try h.process(acc, context)
      catch {
        case e: Exception => // hook errors logged, pipeline continues (ts_extensions.py:70-75)
          errors.add(ProcessingError(e.getMessage, ErrorSeverity.Warning, "HookError"))
          acc
      }
    }
    LoadedSeries(hooked, metas, tsRenamed, errors, stats, context.toMap)
  }

  private def cleanName(c: String): String = {
    val stripped = if (naming.stripWhitespace) c.trim else c // C1
    val renamed = naming.renameMap.getOrElse(stripped, stripped) // C2
    if (naming.cleanColumnNames) { // C3: keep last " - " segment
      val parts = renamed.split(" - ")
      parts.last.trim
    } else renamed
  }

  private def applyNaming(df: DataFrame): DataFrame = {
    val metaCols = Set("source_file", "file_start_time", "file_end_time")
    val newNames = df.columns.toIndexedSeq.map(c => if (metaCols(c)) c else cleanName(c))
    df.toDF(newNames: _*)
  }
}
