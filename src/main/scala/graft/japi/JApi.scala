package graft.japi

import graft.dsl
import graft.logic.{GenPred, Op, OpPred, Pred, Query}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.{List => JList}
import scala.jdk.CollectionConverters._

/** Java-friendly facade (reference jcascalog module: Api/Subquery/
  * Predicate over the same engine, jcascalog_test.clj). No varargs
  * overloading games, no implicits — plain lists, builder style:
  *
  * {{{
  * Subquery q = JApi.subquery(List.of("?person"))
  *     .generator(df, List.of("?person", "?age"))
  *     .op(Ops.lt(), List.of("?age", 30))
  *     .build();
  * JApi.run(spark, q);
  * }}}
  */
object JApi {

  final class SubqueryBuilder(out: JList[String]) {
    private val preds = scala.collection.mutable.ArrayBuffer[Pred]()

    def generator(df: DataFrame, fields: JList[String]): SubqueryBuilder = {
      preds += GenPred(_ => df, fields.asScala.toSeq)
      this
    }

    def parquet(path: String, fields: JList[String]): SubqueryBuilder = {
      preds += dsl.parquet(path)(fields.asScala.toSeq: _*)
      this
    }

    /** Filter predicate (no outputs). */
    def op(o: Op, in: JList[Object]): SubqueryBuilder = {
      preds += OpPred(o, in.asScala.toSeq, Nil)
      this
    }

    /** Operation with outputs (the `:>` form). */
    def op(o: Op, in: JList[Object], outFields: JList[String]): SubqueryBuilder = {
      preds += OpPred(o, in.asScala.toSeq, outFields.asScala.toSeq)
      this
    }

    def exists(df: DataFrame, fields: JList[String]): SubqueryBuilder = {
      preds += graft.logic.ExistsPred(GenPred(_ => df, fields.asScala.toSeq), true)
      this
    }

    def build(): Query = Query(out.asScala.toSeq, preds.toSeq)
  }

  def subquery(outFields: JList[String]): SubqueryBuilder =
    new SubqueryBuilder(outFields)

  def run(spark: SparkSession, q: Query): DataFrame = q.toDF(spark)

  /** The shipped op library, reachable without Scala-object syntax
    * (jcascalog.op.{Sum, Count, ...} analog). */
  def count(): Op = graft.ops.Ops.count
  def sum(): Op = graft.ops.Ops.sum
  def min(): Op = graft.ops.Ops.min
  def max(): Op = graft.ops.Ops.max
  def avg(): Op = graft.ops.Ops.avg
  def distinctCount(): Op = graft.ops.Ops.distinctCount
  def limit(n: Int): Op = graft.ops.Ops.limit(n)
  def limitRank(n: Int): Op = graft.ops.Ops.limitRank(n)
  def lt(): Op = graft.ops.Ops.lt
  def lte(): Op = graft.ops.Ops.lte
  def gt(): Op = graft.ops.Ops.gt
  def gte(): Op = graft.ops.Ops.gte
  def plus(): Op = graft.ops.Ops.plus
  def minus(): Op = graft.ops.Ops.minus
  def times(): Op = graft.ops.Ops.times
  def div(): Op = graft.ops.Ops.div
  def limitHeap(n: Int): Op = graft.ops.Ops.limitHeap(n)
  def limitSalted(n: Int, salt: Int): Op = graft.ops.Ops.limitSalted(n, salt)

  // ---------------------------------------------------- pipeline facade

  def curate(docs: DataFrame, lang: String): DataFrame =
    graft.pipeline.Curate.curate(docs, lang)
  def nearDupDedup(docs: DataFrame, threshold: Double): DataFrame =
    graft.pipeline.Dedup.nearDupDedup(docs, threshold = threshold)
  def bruteForceKnn(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    graft.pipeline.Similarity.bruteForceKnn(corpus, probes, k)
  def ivfKnn(corpus: DataFrame, probes: DataFrame, k: Int, cells: Int, nProbe: Int): DataFrame =
    graft.pipeline.Similarity.ivfKnn(corpus, probes, k, cells, nProbe)
  def bucketSink(df: DataFrame, table: String, keys: JList[String], buckets: Int): Unit =
    graft.sources.Taps.bucketSink(df, table, keys.asScala.toSeq, buckets)
}
