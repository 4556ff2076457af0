package graft.sources

import org.apache.spark.sql.DataFrame

/** Catalog table sink with the reference's semantics (ref utils.py:124-142):
  * overwrite-mode saveAsTable with schema overwrite, and write failures
  * swallowed with a diagnostic instead of propagating — the pipeline
  * prefers partial progress over aborting the workflow run.
  */
object TableSink {

  /** Returns true when the write succeeded. */
  def writeTable(df: DataFrame, table: String, mode: String = "overwrite"): Boolean =
    try {
      df.write.mode(mode).option("overwriteSchema", "true").saveAsTable(table)
      true
    } catch {
      case e: Exception =>
        // ref utils.py:141-142: print-and-continue
        System.err.println(s"[TableSink] $mode of $table failed: ${e.getMessage}")
        false
    }

  // ---- Special-character column names (ref utils.py:139) -----------------
  // The reference's entire reason for `delta.columnMapping.mode=name` is
  // persisting survey columns like `Race/Ethnicity`, `Survey Completed?`,
  // `% of Survey Responses` (ref merge_census.py:98-100) that parquet/
  // metastore field-name rules reject. The parquet-native equivalent is a
  // REVERSIBLE name mapping applied at the sink boundary: every char
  // outside [A-Za-z0-9] — including `_`, so the escape marker `_u` can
  // never collide with an original sequence — encodes as `_uHHHH` (UTF-16
  // code unit, lowercase hex). No sidecar file: the mapping is a pure
  // function of the stored name, so any reader restores verbatim names
  // from the table alone.

  private val SafeChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet

  /** The EXACT error conditions the concurrent view-swap race produces
    * (captured from a 16-thread CREATE OR REPLACE VIEW race probe:
    * ALREADY_EXISTS ×117, NOT_FOUND ×31 over 176 racing statements).
    * The swap retry matches this set verbatim — a permanent conflict
    * (e.g. EXPECT_VIEW_NOT_TABLE.* from a real table squatting on the
    * name) shares no member and rethrows on first sight. */
  private[graft] val TransientSwapConditions: Set[String] =
    Set("TABLE_OR_VIEW_ALREADY_EXISTS", "TABLE_OR_VIEW_NOT_FOUND")

  def escapeColName(name: String): String =
    name.flatMap(c => if (SafeChars(c)) c.toString else f"_u${c.toInt}%04x")

  def restoreColName(name: String): String = {
    val m = java.util.regex.Pattern.compile("_u([0-9a-f]{4})").matcher(name)
    val sb = new StringBuffer
    while (m.find())
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb).toString
  }

  /** [[writeTable]] with verbatim column names escaped to storage-safe
    * form. Pair with [[readTableRestored]]. */
  def writeTableEscaped(df: DataFrame, table: String,
      mode: String = "overwrite"): Boolean =
    writeTable(df.toDF(df.columns.map(escapeColName).toIndexedSeq: _*),
      table, mode)

  /** Read a table written by [[writeTableEscaped]], restoring the
    * verbatim (special-character) column names. */
  def readTableRestored(
      spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    t.toDF(t.columns.map(restoreColName).toIndexedSeq: _*)
  }

  /** Drop a table from the catalog AND purge its warehouse directory —
    * `DROP TABLE ... PURGE` semantics for the in-memory catalog. A fresh
    * session's catalog doesn't know about a previous run's managed-table
    * directory, so a bare `saveAsTable` would fail
    * LOCATION_ALREADY_EXISTS (which [[writeTable]] then swallows, per
    * reference semantics); purging the stale location first is the
    * recovery every cross-session writer needs (spec'd in
    * `TableSinkSpec`). */
  def dropPurge(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Overwrite with Delta-style reader isolation, parquet-native: the
    * ref's `delta.columnMapping.mode=name` table (utils.py:139) gives
    * ACID overwrite-while-read, which plain parquet `overwrite` lacks —
    * a reader mid-scan can see the directory being rewritten under it.
    * The standard parquet-native repair is write-new-then-swap: each
    * overwrite lands in a FRESH versioned directory (`v1`, `v2`, …), and
    * the catalog name repoints via `CREATE OR REPLACE VIEW` — a single
    * metastore operation, so a reader either resolves the old version's
    * path (whose files are never mutated) or the new one, never a
    * half-rewritten directory. Old versions stay on disk for in-flight
    * readers / time travel until `keepVersions` prunes them (only
    * versions older than the previous one are ever deleted — the
    * previous version may still be mid-scan).
    *
    * WRITER-WRITER concurrency (the one Delta behavior the plain form
    * lacked — optimistic concurrency control):
    *  - version numbers are CLAIMED by an atomic create-if-absent of a
    *    `.claim-vN` marker through the pluggable [[ClaimStore]]
    *    (O_EXCL file locally; conditional-put on object stores — see
    *    the trait doc): two concurrent writers can NEVER both own `vN`,
    *    so neither clobbers the other's files — each conflicting writer
    *    transparently retries at N+1, Delta's "blind append wins, no
    *    lost table state" outcome for overwrite-mode conflicts;
    *  - a version is COMMITTED only when its `_SUCCESS` marker lands
    *    (the Hadoop committer writes it last), so a claimed-but-crashed
    *    writer leaves an ignorable husk, never a readable half-table;
    *  - the view swap is monotonic: after swapping to its own version,
    *    a writer re-checks the highest COMMITTED version and re-swaps
    *    forward if a concurrent writer overtook it — the "helping"
    *    pattern; whoever finishes last leaves the view on the highest
    *    committed version, and the view never points at an uncommitted
    *    directory.
    * Returns the version number written. */
  def overwriteViaSwap(
      df: DataFrame, table: String, baseDir: String,
      keepVersions: Int = 2,
      claims: ClaimStore = ClaimStore.local): Long = {
    val spark = df.sparkSession
    val dir = new java.io.File(baseDir, table)
    dir.mkdirs()
    val next = claimVersion(dir, claims)
    val path = new java.io.File(dir, s"v$next").toString
    df.write.mode("overwrite").parquet(path)
    def swapTo(v: Long): Unit = {
      val p = new java.io.File(dir, s"v$v").toString
      // the swap: one catalog statement; old version files are untouched.
      // CREATE OR REPLACE VIEW is NOT atomic in the session catalog
      // (replace = a lookup + alter/create window, and two concurrent
      // swappers — a writer plus a helper — can each observe the other's
      // half-state). The two transient conditions were captured from a
      // 16-thread race probe against this catalog and are matched
      // EXACTLY, not by substring: TABLE_OR_VIEW_NOT_FOUND (a concurrent
      // replace opened the lookup gap) and TABLE_OR_VIEW_ALREADY_EXISTS
      // (both swappers chose the create path). Only C-O-R VIEW runs
      // here, so ALREADY_EXISTS can only arise from that create-path
      // race — a REAL table squatting on the name surfaces as
      // EXPECT_VIEW_NOT_TABLE.* (verified), which rethrows immediately,
      // as do permissions and every other condition. The swap is
      // idempotent and the helping loop below is monotonic, so retrying
      // a transient is safe; the short exponential backoff keeps two
      // symmetric racers from lock-stepping through the window.
      var attempts = 0
      var done = false
      while (!done) {
        try {
          spark.sql(
            s"CREATE OR REPLACE VIEW `$table` AS SELECT * FROM parquet.`$p`")
          done = true
        } catch {
          case e: org.apache.spark.sql.AnalysisException
              if attempts < 10 && Option(e.getCondition).exists(
                TableSink.TransientSwapConditions.contains) =>
            attempts += 1
            Thread.sleep(math.min(200L, 5L << attempts))
        }
      }
    }
    swapTo(next)
    // helping pass: if a concurrent writer committed a HIGHER version
    // between our commit and our swap, move the view forward to it (it
    // may have swapped before us, leaving the view stale-but-older).
    // Loop until stable — each pass only ever moves the view forward.
    var target = next
    var latest = committedVersions(dir).lastOption.getOrElse(next)
    while (latest > target) {
      swapTo(latest)
      target = latest
      latest = committedVersions(dir).lastOption.getOrElse(target)
    }
    // prune: keep the newest keepVersions COMMITTED versions (the
    // immediately-previous one may still be mid-scan and must survive);
    // never touch versions newer than ours (a concurrent writer's
    // in-flight claim) — only strictly-older committed ones fall out
    committedVersions(dir).dropRight(keepVersions).filter(_ < next)
      .foreach { v =>
        def rec(f: java.io.File): Unit = {
          Option(f.listFiles).iterator.flatten.foreach(rec)
          f.delete(); ()
        }
        rec(new java.io.File(dir, s"v$v"))
        new java.io.File(dir, s".claim-v$v").delete()
      }
    next
  }

  /** All version numbers under `dir` whose `_SUCCESS` commit marker
    * exists, ascending. Claimed-but-unfinished (or crashed) writers'
    * directories are excluded — they are invisible to readers and to
    * the swap. */
  def committedVersions(dir: java.io.File): Seq[Long] =
    Option(dir.listFiles).iterator.flatten
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getName.drop(1).toLong).toSeq.sorted

  /** The one primitive the OCC protocol needs from storage: an atomic
    * create-if-absent with exactly one winner among racing callers.
    * POSIX gives it for free (`O_EXCL` file creation — the [[local]]
    * adapter); **S3-class object stores do NOT make `mkdir` atomic** (a
    * "directory" is a key prefix, and two PUTs both succeed), so a
    * 100 TB deployment plugs in a conditional-put adapter instead:
    * S3 `If-None-Match: *` (supported since 2024), GCS
    * `x-goog-if-generation-match: 0`, ABFS `If-None-Match: *` — each is
    * exactly this contract, one HTTP header. Everything above the claim
    * (versioned dirs, `_SUCCESS`-gated visibility, the helping swap,
    * pruning) is adapter-agnostic. Delta Lake solves the same problem
    * with conditional-put log records (ref utils.py:124-142 is the
    * reference's Delta sink); this is the minimal parquet-native form. */
  trait ClaimStore {
    /** True iff THIS caller created `name` under `dir` — losers get
      * false, never an exception. */
    def tryClaim(dir: java.io.File, name: String): Boolean
  }

  object ClaimStore {
    /** Local-filesystem adapter: `Files.createFile` = open(O_CREAT|O_EXCL),
      * atomic on every POSIX filesystem (and NFSv3+). */
    val local: ClaimStore = (dir: java.io.File, name: String) =>
      try {
        java.nio.file.Files.createFile(new java.io.File(dir, name).toPath)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }

    /** Generic HTTP conditional-put adapter — the actual wire protocol a
      * 100 TB deployment uses: `PUT <endpoint>/<url-encoded claim key>`
      * with `If-None-Match: *`, which S3 (since 2024-08), ABFS, and any
      * S3-compatible store (MinIO et al.) honor as create-if-absent with
      * exactly one winner (GCS spells the same header
      * `x-goog-if-generation-match: 0` — pass it via `extraHeader`).
      * 2xx ⇒ this caller owns the claim; 412 Precondition Failed (or
      * S3's historical 409) ⇒ lost the race, retry upward. ANY other
      * status throws: storage trouble must fail the writer loudly —
      * treating a 500 as "lost" would let two writers share a version
      * the moment the store hiccups. The claim key is the table dir's
      * absolute path + marker name, so distinct tables (and distinct
      * local test dirs) never collide on one endpoint. */
    def httpConditionalPut(
        endpoint: java.net.URI,
        extraHeader: Option[(String, String)] = None): ClaimStore =
      new ClaimStore {
        private val client = java.net.http.HttpClient.newHttpClient()
        def tryClaim(dir: java.io.File, name: String): Boolean = {
          val key = java.net.URLEncoder.encode(
            s"${dir.getAbsolutePath}/$name", "UTF-8")
          val b = java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(
              endpoint.toString.stripSuffix("/") + "/" + key))
            .header("If-None-Match", "*")
            .PUT(java.net.http.HttpRequest.BodyPublishers.noBody())
          extraHeader.foreach { case (k, v) => b.header(k, v) }
          val resp = client.send(
            b.build(),
            java.net.http.HttpResponse.BodyHandlers.discarding())
          resp.statusCode() match {
            case ok if ok / 100 == 2 => true
            case 412 | 409 => false
            case other => throw new IllegalStateException(
              s"conditional PUT returned $other for claim $name — " +
                "refusing to guess who owns the version")
          }
        }
      }
  }

  /** Atomically claim the next free version number through the
    * [[ClaimStore]]: exactly one of any set of racing writers wins each
    * `.claim-vN` marker; losers retry upward. The scan starts past every
    * existing claim marker AND version directory (committed, claimed, or
    * husk), so a claimed-but-crashed writer is skipped, never reused. */
  private def claimVersion(dir: java.io.File, claims: ClaimStore): Long = {
    def existingMax: Long = Option(dir.listFiles).iterator.flatten
      .flatMap { f =>
        if (f.isDirectory && f.getName.matches("v\\d+"))
          Some(f.getName.drop(1).toLong)
        else if (f.isFile && f.getName.matches("\\.claim-v\\d+"))
          Some(f.getName.stripPrefix(".claim-v").toLong)
        else None
      }.maxOption.getOrElse(0L)
    var v = existingMax + 1
    while (!claims.tryClaim(dir, s".claim-v$v")) v += 1
    // the directory itself needs no atomicity once the claim is owned
    new java.io.File(dir, s"v$v").mkdirs()
    v
  }
}
