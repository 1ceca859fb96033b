package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Standard session factory: every entry point (Verify, Bench, tests) uses
  * the same config so plans and numeric results are reproducible.
  *
  * Scale notes (targets a 1000-executor cluster even though we test on
  * local[N]):
  *  - `shuffle.partitions` follows the core count locally; on a real
  *    cluster AQE coalesces post-shuffle partitions so the static value
  *    only seeds the initial plan.
  *  - AQE on: runtime re-plan for skew joins + dynamic coalescing.
  *  - UTC session timezone: numeric parity with the DuckDB oracle.
  *  - `nanosAsLong`: the events table carries parquet TIMESTAMP(NANOS)
  *    which Spark has no native type for; we read the raw long and floor
  *    to micros in [[graft.sources.Tables.events]].
  */
object GraftSession {

  private val UuidConfKey = "spark.graft.session.uuid"
  private val uuidLock = new Object

  /** Stable per-session identity for cache keys. `System.identityHashCode`
    * is reusable after GC — a fresh session could collide with a dead one
    * and be handed its cached DataFrames (ADVICE r5). A UUID pinned in the
    * session conf is unique for the session's lifetime and dies with it.
    * Lazily assigned so sessions not built via [[get]] (tests) work too.
    */
  def sessionUuid(spark: SparkSession): String = uuidLock.synchronized {
    spark.conf.getOption(UuidConfKey) match {
      case Some(u) => u
      case None =>
        val u = java.util.UUID.randomUUID().toString
        spark.conf.set(UuidConfKey, u)
        u
    }
  }
  /** Folds a constant integral argument of a graft_* SQL function to an
    * Int: accepts any integral literal width (INT, BIGINT, SMALLINT,
    * TINYINT — e.g. `graft_topk(s, id, CAST(5 AS BIGINT))`) and any
    * foldable integral expression (`2 + 3`), keeping a clear error for
    * truly non-constant or non-integral arguments (ADVICE r3).
    */
  private def constDoubleArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Array[Double] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ok = e.foldable && (e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a constant ARRAY<DOUBLE> expression, got $e")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
  }

  private def constLongArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Array[Long] = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val ok = e.foldable && (e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a constant ARRAY<BIGINT> expression, got $e")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
  }

  private def constDouble(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Double = {
    import org.apache.spark.sql.types.DoubleType
    val ok = e.foldable && e.dataType == DoubleType
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a constant DOUBLE expression, got $e")
    e.eval() match {
      case n: java.lang.Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"$what must be a constant DOUBLE expression, got $other")
    }
  }

  private def constInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val ok = e.foldable &&
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a constant integer expression, got $e")
    e.eval() match {
      case n: java.lang.Number => java.lang.Math.toIntExact(n.longValue)
      case other => throw new IllegalArgumentException(
        s"$what must be a constant integer expression, got $other")
    }
  }

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      // custom codegen'd expressions (see graft.functions) — injected via
      // the public extensions API so they're usable from spark.sql too.
      .withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("graft_polyhash"),
          new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "graft_polyhash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.PolyHash(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_hash_embed"),
          new ExpressionInfo(classOf[graft.functions.HashEmbed].getName, "graft_hash_embed"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val dim = children.lift(1)
              .map(constInt(_, "graft_hash_embed(th[, dim]): dim")).getOrElse(16)
            graft.functions.HashEmbed(children.head, dim)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_minhash"),
          new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.MinHashSig(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_shingle_hash"),
          new ExpressionInfo(classOf[graft.functions.ShingleHash].getName, "graft_shingle_hash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val n = children.lift(1)
              .map(constInt(_, "graft_shingle_hash(toks[, n]): n")).getOrElse(3)
            graft.functions.ShingleHash(children.head, n)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_lexcount"),
          new ExpressionInfo(classOf[graft.functions.TokenLexCount].getName, "graft_lexcount"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.TokenLexCount(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_topk"),
          new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "graft_topk"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val k = children.lift(2)
              .map(constInt(_, "graft_topk(score, id[, k]): k")).getOrElse(10)
            graft.functions.TopKByScore(children(0), children(1), k)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_dotp"),
          new ExpressionInfo(classOf[graft.functions.DotPair].getName, "graft_dotp"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.DotPair(children(0), children(1))))
        ext.injectFunction((
          FunctionIdentifier("graft_dot"),
          new ExpressionInfo(classOf[graft.functions.DotConst].getName, "graft_dot"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val cv = children.lift(1).getOrElse(
              throw new IllegalArgumentException(
                "graft_dot(v, constVec): constVec is required"))
            require(cv.foldable,
              "graft_dot(v, constVec): constVec must be a foldable array literal")
            // typed extraction (ADVICE r4): a NULL literal or a
            // non-double element type used to surface as an opaque
            // NPE/ClassCastException at plan time — convert the numeric
            // widths explicitly and fail with the signature otherwise
            import org.apache.spark.sql.types._
            def bad(what: String) = throw new IllegalArgumentException(
              s"graft_dot(v, constVec): constVec must be a non-null numeric " +
              s"array literal (ARRAY<DOUBLE/FLOAT/INT/BIGINT/DECIMAL>), got $what")
            val arr = cv.eval(null) match {
              case null => bad("NULL")
              case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
                cv.dataType match {
                  case ArrayType(DoubleType, _)  => ad.toDoubleArray().toSeq
                  case ArrayType(FloatType, _)   => ad.toFloatArray().toSeq.map(_.toDouble)
                  case ArrayType(IntegerType, _) => ad.toIntArray().toSeq.map(_.toDouble)
                  case ArrayType(LongType, _)    => ad.toLongArray().toSeq.map(_.toDouble)
                  case ArrayType(dt: DecimalType, _) =>
                    (0 until ad.numElements()).map(i =>
                      ad.getDecimal(i, dt.precision, dt.scale).toDouble)
                  case other => bad(other.sql)
                }
              case other => bad(other.getClass.getSimpleName)
            }
            graft.functions.DotConst(children.head, arr)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_html_strip"),
          new ExpressionInfo(classOf[graft.functions.HtmlStrip].getName, "graft_html_strip"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.HtmlStrip(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_pq_encode"),
          new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "graft_pq_encode"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 5,
              "graft_pq_encode(vec, flatCb, s, k, d) takes 5 arguments")
            graft.functions.PqEncode(children.head,
              constDoubleArray(children(1), "graft_pq_encode: flatCb"),
              constInt(children(2), "graft_pq_encode: s"),
              constInt(children(3), "graft_pq_encode: k"),
              constInt(children(4), "graft_pq_encode: d"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_adc_score"),
          new ExpressionInfo(classOf[graft.functions.AdcScore].getName, "graft_adc_score"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 11,
              "graft_adc_score(code, cent_id, centIds, qc, cn2, cdotrFlat, " +
                "qdotrFlat, rn2Flat, qNorm, s, k) takes 11 arguments")
            graft.functions.AdcScore(children(0), children(1),
              constLongArray(children(2), "graft_adc_score: centIds"),
              constDoubleArray(children(3), "graft_adc_score: qc"),
              constDoubleArray(children(4), "graft_adc_score: cn2"),
              constDoubleArray(children(5), "graft_adc_score: cdotrFlat"),
              constDoubleArray(children(6), "graft_adc_score: qdotrFlat"),
              constDoubleArray(children(7), "graft_adc_score: rn2Flat"),
              constDouble(children(8), "graft_adc_score: qNorm"),
              constInt(children(9), "graft_adc_score: s"),
              constInt(children(10), "graft_adc_score: k"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_adc_score_at"),
          new ExpressionInfo(classOf[graft.functions.AdcScoreAt].getName,
            "graft_adc_score_at"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 11,
              "graft_adc_score_at(code, gp, qcB, cn2B, cdotrB, qdotrB, " +
                "rn2Flat, qNormB, nprobe, s, k) takes 11 arguments")
            graft.functions.AdcScoreAt(children(0), children(1),
              constDoubleArray(children(2), "graft_adc_score_at: qcB"),
              constDoubleArray(children(3), "graft_adc_score_at: cn2B"),
              constDoubleArray(children(4), "graft_adc_score_at: cdotrB"),
              constDoubleArray(children(5), "graft_adc_score_at: qdotrB"),
              constDoubleArray(children(6), "graft_adc_score_at: rn2Flat"),
              constDoubleArray(children(7), "graft_adc_score_at: qNormB"),
              constInt(children(8), "graft_adc_score_at: nprobe"),
              constInt(children(9), "graft_adc_score_at: s"),
              constInt(children(10), "graft_adc_score_at: k"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_dequant_cosine"),
          new ExpressionInfo(classOf[graft.functions.DequantCosine].getName,
            "graft_dequant_cosine"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 3,
              "graft_dequant_cosine(q, scale, y) takes 3 arguments")
            graft.functions.DequantCosine(children(0), children(1),
              constDoubleArray(children(2), "graft_dequant_cosine: y"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_dequant_cosine_col"),
          new ExpressionInfo(classOf[graft.functions.DequantCosineCol].getName,
            "graft_dequant_cosine_col"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 3,
              "graft_dequant_cosine_col(q, scale, y) takes 3 arguments")
            graft.functions.DequantCosineCol(children(0), children(1), children(2))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_norm"),
          new ExpressionInfo(classOf[graft.functions.Normalize].getName, "graft_norm"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.Normalize(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_field_stats"),
          new ExpressionInfo(classOf[graft.functions.FieldStats].getName, "graft_field_stats"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.FieldStats(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_pii_scan"),
          new ExpressionInfo(classOf[graft.functions.PiiScan].getName, "graft_pii_scan"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.PiiScan(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_domain_lookup"),
          new ExpressionInfo(classOf[graft.functions.BroadcastLookup].getName,
            "graft_domain_lookup"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 2,
              "graft_domain_lookup(key, handle) takes 2 arguments")
            // the handle literal is a plan-time token into
            // BroadcastRegistry; the resolved expression holds the
            // Broadcast itself (see BroadcastLookup scaladoc)
            graft.functions.BroadcastLookup(children.head,
              graft.functions.BroadcastRegistry.get(
                constInt(children(1), "graft_domain_lookup: handle").toLong))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_money_scaled"),
          new ExpressionInfo(classOf[graft.functions.MoneyScaled].getName,
            "graft_money_scaled"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 2,
              "graft_money_scaled(x, scale) takes 2 arguments")
            graft.functions.MoneyScaled(children.head,
              constInt(children(1), "graft_money_scaled: scale"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_long_to_money"),
          new ExpressionInfo(classOf[graft.functions.LongToMoney].getName,
            "graft_long_to_money"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.length == 3,
              "graft_long_to_money(unscaled, precision, scale) takes 3 arguments")
            graft.functions.LongToMoney(children.head,
              constInt(children(1), "graft_long_to_money: precision"),
              constInt(children(2), "graft_long_to_money: scale"))
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_quant8"),
          new ExpressionInfo(classOf[graft.functions.Quant8].getName, "graft_quant8"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.Quant8(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_token_hashes"),
          new ExpressionInfo(classOf[graft.functions.TokenHashes].getName, "graft_token_hashes"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.TokenHashes(children.head)))
      }
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // serve-path plan stability: literal IN-lists of >= 2 values become
      // InSet, whose non-switchable codegen (e.g. LongType cent_id probe
      // filters) carries the set as a REFERENCE object instead of inlined
      // literals — repeated index searches with different probe sets then
      // produce byte-identical generated code and hit the codegen cache
      // instead of paying a per-query janino compile (~50-100 ms, the
      // dominant per-call serve cost at small nprobe). Default is 10.
      .config("spark.sql.optimizer.inSetConversionThreshold", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: the small-append committer tuning (fileoutputcommitter v2,
      // no _SUCCESS marker, no parquet summary files) lives on the K1
      // append write itself (Sinks.appendPartitioned per-write options),
      // NOT here: session-wide it made task-committed files visible to
      // EVERY sink/verify reader even when a job later failed (ADVICE
      // r17 #3) — only the tick append path has the re-seed +
      // X5-dedup machinery to tolerate that.
      .config("spark.ui.enabled", "false")
      // opt-in event logging for job/stage attribution (guide §1/§7):
      // measurement instrumentation only, never set by the bench or
      // verify defaults
      .config("spark.eventLog.enabled",
        sys.env.contains("SPARK_GRAFT_EVENTLOG").toString)
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "/tmp"))

  def get(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = builder(cores).getOrCreate()
    // getOrCreate silently ignores static confs when a session already
    // exists in the JVM; fail loudly instead of computing wrong answers.
    val mustMatch = Seq(
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    for ((k, want) <- mustMatch) {
      val got = spark.conf.get(k, "")
      require(got == want,
        s"GraftSession: existing SparkSession has $k=$got, need $want — " +
        "stop the stale session before calling GraftSession.get")
    }
    spark.sparkContext.setLogLevel("WARN")
    sessionUuid(spark) // pin the cache-key identity at creation
    spark
  }
}
