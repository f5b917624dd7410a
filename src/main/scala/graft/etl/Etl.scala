package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The morphline command set re-expressed as composable
 * `DataFrame => DataFrame` operators (each cites the reference command
 * it covers). Morphlines push one Record at a time through a command
 * chain (LoadSolrBuilder.java:112-124 pattern); here every command is a
 * declarative column transform, so the whole chain fuses into one
 * whole-stage-codegen'd projection — no per-record interpreter.
 */
object Etl {

  /**
   * generateSolrSequenceKey (GenerateSolrSequenceKeyBuilder.java:99-127):
   * unique key = baseId + "#" + runningCountPerFile, counter resetting
   * per input file (session), pre-existing ids preserved. The per-file
   * running counter is a window rank; at scale the window partitions by
   * file so no global ordering is required.
   */
  def generateSequenceKey(df: DataFrame, baseId: Column, file: Column,
                          orderWithinFile: Column, existingId: Option[Column] = None,
                          out: String = "id"): DataFrame = {
    // the reference's counter advances only when it GENERATES an id —
    // records carrying their own id are preserved without consuming a
    // sequence number (GenerateSolrSequenceKeyBuilder.java:99-127), so
    // the rank counts prior id-less rows, not prior rows
    val needsId = existingId.map(_.isNull).getOrElse(lit(true))
    val w = Window.partitionBy(file).orderBy(orderWithinFile)
      .rowsBetween(Window.unboundedPreceding, 0)
    val seq = count(when(needsId, 1)).over(w) - 1
    val gen = concat(baseId.cast("string"), lit("#"), seq.cast("string"))
    df.withColumn(out, existingId.map(e => coalesce(e, gen)).getOrElse(gen))
  }

  /**
   * generateUUID (solrCellDocumentTypes.conf:92-97) with
   * `preserveExisting`. `deterministic=true` derives an RFC-4122-shaped
   * name-based id from the row content instead of a random one, so
   * reruns (and the DuckDB oracle) reproduce it — the reference gets
   * rerun-stability from rerunning whole files; a distributed engine
   * wants it per-row.
   */
  def generateUuid(df: DataFrame, out: String, from: Column,
                   preserveExisting: Option[Column] = None,
                   deterministic: Boolean = true): DataFrame = {
    val h = md5(from.cast("string"))
    val det = concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
    val gen = if (deterministic) det else expr("uuid()")
    df.withColumn(out, preserveExisting.map(e => coalesce(e, gen)).getOrElse(gen))
  }

  /**
   * convertTimestamp (tutorialReadAvroContainer.conf:112-120):
   * try input formats in order, emit Solr ISO-8601 UTC
   * (yyyy-MM-dd'T'HH:mm:ss.SSS'Z' is Solr's canonical form).
   */
  def convertTimestamp(df: DataFrame, in: Column, out: String,
                       inputFormats: Seq[String],
                       outputFormat: String = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"): DataFrame = {
    val parsed = coalesce(inputFormats.map(f => try_to_timestamp(in, lit(f))): _*)
    df.withColumn(out, date_format(parsed, outputFormat))
  }

  /** setValues / addValues (solrCellDocumentTypes.conf:113-119). */
  def setValue(df: DataFrame, field: String, value: Column): DataFrame =
    df.withColumn(field, value)

  /** addValues onto a multivalued (array) field = concat semantics. */
  def addValues(df: DataFrame, field: String, values: Column): DataFrame =
    df.withColumn(field,
      when(col(field).isNull, values).otherwise(concat(col(field), values)))

  /**
   * Solr atomic updates (`set` / `inc` / `add` / `remove` /
   * `removeregex` / `add-distinct` — the full modifier family)
   * applied as a bulk merge: left-join `updates` onto `base` by `key`
   * and combine per field — `set` overwrites when the update carries a
   * non-null value (null/absent keeps the old value), `inc` adds the
   * numeric delta, `add` appends to a multivalued (array) field,
   * `remove` drops occurrences of the given values, `removeregex`
   * drops entries matching any given pattern, `addDistinct` appends
   * only values not already present.
   * Documents without an update pass through unchanged; updates whose
   * key matches nothing are ignored (Solr would create a doc — that is
   * an ingest, not an update, and belongs to the union + dedup path).
   *
   * One equi-join shuffle on the key; the updates side is usually the
   * small one — broadcast it at the call site when it fits.
   */
  def applyAtomicUpdates(base: DataFrame, updates: DataFrame, key: String,
                         set: Seq[String] = Nil, inc: Seq[String] = Nil,
                         add: Seq[String] = Nil,
                         remove: Seq[String] = Nil,
                         removeRegex: Seq[String] = Nil,
                         addDistinct: Seq[String] = Nil): DataFrame = {
    val touched = (set ++ inc ++ add ++ remove ++ removeRegex ++ addDistinct).distinct
    require(touched.nonEmpty, "no update fields given")
    require(!touched.contains(key), "cannot update the key itself")
    // duplicate update keys would FAN OUT base rows through the join,
    // silently duplicating documents — rejected in-job (same
    // raise_error-rides-the-plan pattern as IndexSchema.requireKey);
    // batch-combine duplicates (sum the incs) upstream instead
    val dupGuard = org.apache.spark.sql.expressions.Window.partitionBy(col(s"__u_$key"))
    val u = updates.select((key +: touched).map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__u_cnt", count(lit(1)).over(dupGuard))
      .withColumn(s"__u_$key",
        when(col("__u_cnt") === 1, col(s"__u_$key"))
          .otherwise(raise_error(concat(lit("duplicate update for key: "),
            col(s"__u_$key").cast("string")))))
      .drop("__u_cnt")
    val joined = base.join(u, base(key) === col(s"__u_$key"), "left")
    val applied = touched.foldLeft(joined) { (d, f) =>
      val upd = col(s"__u_$f")
      val merged =
        if (set.contains(f)) coalesce(upd, col(f))
        else if (inc.contains(f))
          // null base counts as 0 (Solr inc on an absent field sets it
          // to the delta) — but a doc with NO update row stays null
          when(upd.isNull, col(f)).otherwise(coalesce(col(f), lit(0)) + upd)
        else if (remove.contains(f))
          // remove: drop OCCURRENCES of the given values (Solr keeps
          // duplicates of everything else — array_except would dedup
          // survivors, so filter instead); absent base stays absent
          when(upd.isNull, col(f))
            .otherwise(filter(col(f), x => !array_contains(upd, x)))
        else if (removeRegex.contains(f))
          // removeregex: drop entries matching ANY update pattern
          when(upd.isNull, col(f))
            .otherwise(filter(col(f), x => !exists(upd, p => regexp_like(x, p))))
        else if (addDistinct.contains(f))
          // add-distinct: append each update value once, iff absent
          // (array_except = distinct upd values not already in base)
          when(upd.isNull, col(f))
            .otherwise(when(col(f).isNull, array_distinct(upd))
              .otherwise(concat(col(f), array_except(upd, col(f)))))
        else // add: null-safe append (no untyped empty-array literals)
          when(upd.isNull, col(f))
            .otherwise(when(col(f).isNull, upd).otherwise(concat(col(f), upd)))
      d.withColumn(f, merged)
    }
    applied.drop((key +: touched).map(c => s"__u_$c"): _*)
  }

  /**
   * extractAvroPaths / extractAvroTree (tutorialReadAvroContainer
   * .conf:84-106): nested-path projection. In Spark nested access is
   * just `col("a.b.c")`; this helper adds the reference's `flatten`
   * semantics for array steps.
   */
  def extractPaths(df: DataFrame, paths: Map[String, String]): DataFrame =
    paths.foldLeft(df) { case (d, (out, path)) => d.withColumn(out, col(path)) }

  /** Flatten every top-level struct column into `prefix_field` columns. */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          st.fields.toSeq.map(sf =>
            col(s"${f.name}.${sf.name}").as(s"${f.name}$sep${sf.name}"))
        case _ => Seq(col(f.name))
      }
    }
    df.select(cols: _*)
  }

  /**
   * separateAttachments (solrCellDocumentTypes.conf:31) / unpack
   * (S11): one record per attachment = explode.
   */
  def separateAttachments(df: DataFrame, attachments: Column,
                          out: String = "attachment"): DataFrame =
    df.withColumn(out, explode(attachments))

  /**
   * tryRules (solrCellDocumentTypes.conf:59-142): first-matching-rule
   * routing. Each rule is (predicate, transform); rows fall through to
   * the first predicate that matches; unmatched rows either error
   * (reference behavior: "tryRules command found no matching rule") or
   * pass through.
   */
  def tryRules(df: DataFrame, rules: Seq[(Column, DataFrame => DataFrame)],
               strictNoMatch: Boolean = false): DataFrame = {
    // guard each branch with "not matched by any earlier rule"
    val guarded = rules.zipWithIndex.map { case ((pred, fn), i) =>
      val notEarlier = rules.take(i).map(r => !coalesce(r._1, lit(false)))
        .foldLeft(lit(true))(_ && _)
      fn(df.filter(coalesce(pred, lit(false)) && notEarlier))
    }
    val anyMatch = rules.map(r => coalesce(r._1, lit(false))).reduce(_ || _)
    if (strictNoMatch) {
      val residue = df.filter(!anyMatch).limit(1).collect()
      if (residue.nonEmpty)
        throw new IllegalArgumentException("tryRules: no matching rule for row " +
          residue.head.toSeq.mkString(","))
    }
    guarded.reduce(_ unionByName _)
  }

  /**
   * The 15 `file_*` metadata fields the mapper attaches to every record
   * (MorphlineMapRunner.java:231-253, names HdfsFileFieldNames.java:
   * 25-40), derived from the binaryFile source's
   * path/length/modificationTime columns.
   */
  def withFileMetadata(df: DataFrame, path: Column, length: Column,
                       modificationTime: Column): DataFrame = {
    val scheme = regexp_extract(path, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    // strip scheme://authority (URI form), then any bare scheme: prefix
    // (file:/x form) — what remains is the filesystem path
    val noAuthority = regexp_replace(path, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    val afterScheme = when(
      regexp_replace(noAuthority, "^[a-zA-Z][a-zA-Z0-9+.-]*:", "") === "", lit("/"))
      .otherwise(regexp_replace(noAuthority, "^[a-zA-Z][a-zA-Z0-9+.-]*:", ""))
    df.withColumn("file_upload_url", path)
      .withColumn("file_download_url", path)
      .withColumn("file_scheme", when(scheme === "", lit("file")).otherwise(scheme))
      .withColumn("file_host", regexp_extract(path, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]*)", 1))
      .withColumn("file_port", regexp_extract(path, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:]*:([0-9]+)", 1))
      .withColumn("file_path", afterScheme)
      .withColumn("file_name", element_at(split(path, "/"), -1))
      .withColumn("file_length", length)
      .withColumn("file_last_modified", modificationTime)
      // owner/group/permissions are not exposed by Spark's binaryFile
      // source; the reference fills them from FileStatus — opt in via
      // withFileStatusMetadata below, which overwrites these nulls.
      .withColumn("file_owner", lit(null).cast("string"))
      .withColumn("file_group", lit(null).cast("string"))
      .withColumn("file_permissions_user", lit(null).cast("string"))
      .withColumn("file_permissions_group", lit(null).cast("string"))
      .withColumn("file_permissions_other", lit(null).cast("string"))
      .withColumn("file_permissions_stickybit", lit(null).cast("string"))
  }

  /**
   * Fill the 6 owner/group/permission `file_*` fields from Hadoop
   * FileStatus, the way the mapper does (MorphlineMapRunner.java:
   * 231-253: `FileStatus.getOwner/getGroup/getPermission` →
   * FILE_OWNER/FILE_GROUP/FILE_PERMISSIONS_*). The lookups run on
   * EXECUTORS (one FileSystem per partition over the distinct paths,
   * Hadoop conf broadcast), then join back on path — no driver-side
   * per-file RPC loop, so a 100M-file corpus enriches as a normal
   * distributed job.
   */
  def withFileStatusMetadata(spark: org.apache.spark.sql.SparkSession,
                             df: DataFrame, pathCol: String = "path"): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new graft.util.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val status = df.select(col(pathCol)).distinct().as[String]
      .mapPartitions { it =>
        val conf = confBc.value.value
        // FileSystem.get caches per (scheme, authority) — one client
        // per partition per filesystem, not per file
        it.map { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val st = hp.getFileSystem(conf).getFileStatus(hp)
          val perm = st.getPermission
          (p, st.getOwner, st.getGroup,
            perm.getUserAction.SYMBOL, perm.getGroupAction.SYMBOL,
            perm.getOtherAction.SYMBOL, perm.getStickyBit.toString)
        }
      }
      .toDF(pathCol, "file_owner", "file_group", "file_permissions_user",
        "file_permissions_group", "file_permissions_other",
        "file_permissions_stickybit")
    df.drop("file_owner", "file_group", "file_permissions_user",
        "file_permissions_group", "file_permissions_other",
        "file_permissions_stickybit")
      .join(status, Seq(pathCol), "left")
  }

  /**
   * Input randomization (O1/O2): the reference shuffles the input FILE
   * LIST so mapper load is even (in-memory below 100001 files,
   * MapReduceIndexerTool.java:961-984 with fixed seed 421439783; an MR
   * job above, LineRandomizerMapper.java:51-63). Spark splits by bytes
   * so this mostly matters for skewed many-small-files layouts;
   * seed-determinism kept for test parity.
   */
  def randomize(df: DataFrame, seed: Long = 421439783L): DataFrame =
    df.withColumn("__r", rand(seed)).orderBy(col("__r")).drop("__r")

  /**
   * [[randomize]]'s ENGINE-REPLAYABLE form — the default for new
   * pipelines: the shuffle key is `md5("<seed>:<id>")` over a caller-
   * named unique id, so the permutation is a pure function of
   * (seed, id) that any engine with md5 reproduces (the partition-
   * seeded `rand` path above depends on Spark's physical partition
   * numbering and survives only as the MR-parity opt-in). The key is
   * kept as `rkey` so the assignment itself is oracle-checkable
   * without materializing a global row position; ordering by rkey is a
   * plain range exchange at any scale. Ties (md5 collisions) break by
   * the id itself, cast to string on both sides.
   */
  def randomizeReplayable(df: DataFrame, id: Column,
                          seed: Long = 421439783L): DataFrame =
    df.withColumn("rkey", md5(concat(lit(s"$seed:"), id.cast("string"))))
      .orderBy(col("rkey"), id.cast("string"))

  /**
   * Alphanumeric ordering key (AlphaNumericComparator.java:38-73):
   * embedded integer runs compare numerically (`part-2` < `part-10`).
   * Normalization: left-pad every digit run to 20 so lexicographic
   * order == alphanumeric order; usable in orderBy at any scale.
   */
  /**
   * Per-row fault tolerance (reference posture: recoverable-exception
   * allowlist + production mode, MorphlineMapRunner.java:110-114;
   * SolrReducer.java:128-148): split a frame into (valid, quarantined)
   * on a validity predicate so bad rows are preserved for inspection
   * instead of failing the job or silently vanishing. Both sides are
   * filters over the same scan — Catalyst reuses the exchange.
   */
  def quarantine(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.filter(coalesce(valid, lit(false))),
      df.filter(!coalesce(valid, lit(false))))

  def alphaNumOrderKey(c: Column): Column = {
    // pad each digit run with zeros to width 20: split into runs via
    // regexp_replace with a callback is unavailable in SQL, so use the
    // two-phase trick: prefix every digit run with its zero padding.
    val padded = regexp_replace(c, "(\\d+)", "00000000000000000000$1")
    // then cut each run back to its last 20 chars
    regexp_replace(padded, "0*(\\d{20})", "$1")
  }
}
