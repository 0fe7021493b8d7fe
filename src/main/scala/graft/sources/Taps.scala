package graft.sources

import graft.logic.GenPred
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Tap surface — sources and sinks (reference
  * cascalog-core/src/clj/cascalog/cascading/tap.clj and
  * cascalog-more-taps). Sources are generators; sinks wrap
  * DataFrameWriter with the reference's :sinkmode semantics.
  */
object Taps {

  /** :sinkmode (tap.clj:104-159): :keep errors if output exists, :update
    * appends, :replace overwrites. */
  val sinkModes: Map[String, SaveMode] = Map(
    "keep" -> SaveMode.ErrorIfExists,
    "update" -> SaveMode.Append,
    "replace" -> SaveMode.Overwrite)

  // -------------------------------------------------------------- sources

  /** hfs-tap equivalent: any format, glob patterns supported natively
    * (`:source-pattern`, tap.clj:75-78). */
  def hfs(format: String, path: String, options: Map[String, String] = Map.empty)(
      fields: Any*): GenPred =
    GenPred(s => s.read.options(options).format(format).load(path), fields)

  /** parquet is the native tuple format (the seqfile role). */
  def seqfile(path: String)(fields: Any*): GenPred =
    GenPred(_.read.parquet(path), fields)

  /** hfs-textline (tap.clj:50-57): one tuple per line. */
  def textline(path: String)(fields: Any*): GenPred =
    GenPred(_.read.text(path), fields)

  /** hfs-delimited (more_taps.clj:11-80): sep/quote/header/inferSchema. */
  def delimited(path: String, sep: String = "\t", header: Boolean = false,
      quote: String = "\"", inferSchema: Boolean = true)(fields: Any*): GenPred =
    GenPred(_.read
      .option("sep", sep).option("header", header.toString)
      .option("quote", quote).option("inferSchema", inferSchema.toString)
      .csv(path), fields)

  /** hfs-wrtseqfile (more_taps.clj:83-112): Hadoop SequenceFile of
    * Writable key/value pairs, as (key string, value string) tuples. */
  def wrtseqfile(path: String)(fields: Any*): GenPred =
    GenPred({ s =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val rdd = s.sparkContext.sequenceFile[String, String](path)
        .map { case (k, v) => Row(k, v) }
      s.createDataFrame(rdd, StructType(Seq(
        StructField("key", StringType), StructField("value", StringType))))
    }, fields)

  /** Writable SequenceFile sink for two-column (string, string) frames. */
  def wrtseqfileSink(df: DataFrame, path: String): Unit =
    df.rdd.map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
      .saveAsSequenceFile(path)

  /** hfs-wholefile (more_taps.clj:114-120): one tuple per whole file. */
  def wholefile(path: String, glob: String = "*")(fields: Any*): GenPred =
    GenPred(_.read.format("binaryFile").option("pathGlobFilter", glob).load(path),
      fields)

  /** JSONL (newline-delimited JSON) source — the training-corpus
    * interchange format (beyond-reference; the hfs-tap role for the
    * corpora LLM pipelines actually ship). Schema inference costs an
    * extra pass over the data; at 100 TB pass `schemaFrom` (a sampled
    * or sibling file) or `schemaDDL` (an explicit DDL string, e.g.
    * "doc_id BIGINT, text STRING") so the scan is single-pass with
    * column pruning pushed into the parser — Spark's JSON reader only
    * materializes the fields the query projects. */
  def jsonl(path: String, schemaDDL: String = "", schemaFrom: String = "",
      options: Map[String, String] = Map.empty)(fields: Any*): GenPred =
    GenPred({ s =>
      var r = s.read.options(options)
      if (schemaDDL.nonEmpty)
        r = r.schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
      else if (schemaFrom.nonEmpty)
        r = r.schema(s.read.options(options).json(schemaFrom).schema)
      r.json(path)
    }, fields)

  // ---------------------------------------------------------------- sinks

  /** A sink: writes a compiled query result. `sinkparts` → coalesce
    * (tap.clj:104-159); `template` → partitioned output by field values
    * (template-tap, tap.clj:80-102). */
  final case class Sink(
      format: String,
      path: String,
      mode: String = "replace",
      sinkparts: Option[Int] = None,
      template: Seq[String] = Nil,
      options: Map[String, String] = Map.empty) {
    def write(df: DataFrame): Unit = {
      val coalesced = sinkparts.fold(df)(df.coalesce)
      var w = coalesced.write.mode(sinkModes(mode)).options(options)
      if (template.nonEmpty) w = w.partitionBy(template: _*)
      w.format(format).save(path)
    }
  }

  def parquetSink(path: String, mode: String = "replace"): Sink =
    Sink("parquet", path, mode)
  def csvSink(path: String, sep: String = "\t", header: Boolean = false,
      mode: String = "replace"): Sink =
    Sink("csv", path, mode, options = Map("sep" -> sep, "header" -> header.toString))
  def textSink(path: String, compression: Option[String] = None,
      mode: String = "replace"): Sink =
    Sink("text", path, mode,
      options = compression.map("compression" -> _).toMap)
  def templateSink(path: String, templateFields: Seq[String],
      format: String = "parquet", mode: String = "replace"): Sink =
    Sink(format, path, mode, template = templateFields)
  /** JSONL sink; `compression` e.g. "gzip"/"zstd" for shipped corpora. */
  def jsonlSink(path: String, compression: Option[String] = None,
      mode: String = "replace"): Sink =
    Sink("json", path, mode,
      options = compression.map("compression" -> _).toMap)

  /** Bucketed-table sink — the 100 TB co-located-join path. Writing both
    * sides of a recurring big-big equi-join bucketed (same keys, same
    * bucket count) lets every later join/aggregation on those keys run
    * WITHOUT a shuffle: Spark's bucketing metadata proves the partitioning
    * (hfs-tap has no Cascading analog; this is Spark-native scale
    * machinery, beyond-reference). `sortCols` additionally pre-sorts
    * within buckets so sort-merge joins skip the per-task sort. */
  def bucketSink(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil, mode: String = "replace",
      path: Option[String] = None): Unit = {
    var w = df.write.mode(sinkModes(mode))
      .bucketBy(buckets, keys.head, keys.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    // explicit path → external table: data lands there instead of the
    // session warehouse dir (callers that must not write under the cwd)
    path.foreach(p => w = w.option("path", p))
    w.format("parquet").saveAsTable(table)
  }

  /** Source over a bucketed table (pairs with [[bucketSink]]). */
  def bucketTap(table: String)(fields: Any*): GenPred =
    GenPred(_.table(table), fields)

  /** stdout tap (tap.clj:225-228). */
  def stdout(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** fn sink (in-memory platform sinks, in_memory/platform.clj:56-76 and
    * fn-sinks at cascading/platform.clj:320-324): deliver the result
    * tuples to a function. */
  def fnSink(f: Seq[Seq[Any]] => Unit): DataFrame => Unit =
    df => f(df.collect().toSeq.map(_.toSeq))

  /** cascalog-tap: a (source, sink) pair (cascading/tap.clj:23-26). */
  final case class CascalogTap(source: Seq[Any] => GenPred, sink: Sink)

  def tap(format: String, path: String, sink: Sink): CascalogTap =
    CascalogTap(fields => hfs(format, path)(fields: _*), sink)

  /** fill-tap! (tap.clj:239-250): write local tuples through a sink. */
  def fillTap(s: SparkSession, sink: Sink, rows: Seq[Seq[Any]]): Unit =
    sink.write(graft.dsl.memDF(s, rows))

  /** get-sink-tuples (tap.clj:252-260): read a tap back to local tuples. */
  def sinkTuples(s: SparkSession, format: String, path: String): Seq[Seq[Any]] =
    s.read.format(format).load(path).collect().toSeq.map(_.toSeq)

  /** pluck-tuple (reference cascading/tap.clj:262-268): read a single
    * tuple from a tap — the head of the sink's tuples, None when empty. */
  def pluckTuple(s: SparkSession, format: String, path: String): Option[Seq[Any]] =
    s.read.format(format).load(path).head(1).headOption.map(_.toSeq)
}
