package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.StructType
import graft.format.GraftDataset

/** UDF transform pipeline — the Spark-native re-design of the reference's
  * `@muller.compute` decorator + `Pipeline.eval` machinery
  * (muller/core/transform/transform.py:490-511 decorator, 70-120
  * ComputeFunction, 290-421 Pipeline.eval, 228-489 composition).
  *
  * The reference fans a row-at-a-time Python function out over
  * thread/process/ray schedulers and then hand-merges per-worker tensor
  * metadata (transform.py:513-745). On Spark ALL of that is the executor
  * + commit protocol: a stage is just `DataFrame => DataFrame`, a
  * row-function runs inside `mapPartitions` (so it is batched per
  * partition, the moral equivalent of `batch_enable`), and `eval` writes
  * through the versioned format's append path. `num_workers`/`scheduler`
  * have no analogue — parallelism is the cluster.
  */
object Compute {

  /** One transform stage. Prefer column-expression stages (codegen'd);
    * use [[rowStage]] only for genuinely imperative per-row logic —
    * mirroring the reference's sample-in/sample-out functions.
    */
  type Stage = DataFrame => DataFrame

  /** A named compute function (reference `@muller.compute(name=...)`). */
  final case class ComputeFn(name: String, stage: Stage) {
    def eval(in: DataFrame): DataFrame = stage(in)
    /** Transform + append into a versioned dataset (reference
      * `fn(args).eval(data_in, ds_out, ...)`).
      */
    def eval(in: DataFrame, out: GraftDataset, message: String): String = {
      out.append(stage(in))
      out.commit(message)
    }
    def andThen(next: ComputeFn): Pipeline = Pipeline(Seq(this, next))
  }

  def compute(name: String)(stage: Stage): ComputeFn = ComputeFn(name, stage)

  /** An imperative per-row stage: `f` may emit 0..n rows per input row
    * (a superset of the reference's 1-in/1-out contract — the reference
    * has no UDTF surface, SURVEY.md §2.9). Runs via `mapPartitions`, so
    * user code is invoked batched per partition with no driver round-trip.
    *
    * `ignoreErrors` mirrors the reference eval option
    * (transform.py:86-120): a row whose function throws is DROPPED
    * instead of failing the job — the curation semantics for dirty
    * corpora (a corrupt sample must not kill a 100 TB pass). Default
    * remains fail-fast.
    */
  def rowStage(outSchema: StructType, ignoreErrors: Boolean = false)(
      f: Row => IterableOnce[Row]): Stage = {
    df => {
      implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
      if (ignoreErrors)
        df.mapPartitions(_.flatMap(r =>
          try f(r)
          catch { case scala.util.control.NonFatal(_) => Nil }))
      else df.mapPartitions(_.flatMap(f))
    }
  }

  /** Ordered composition of compute functions (reference `Pipeline`,
    * transform.py:228-489): stages apply in sequence; Catalyst fuses
    * adjacent expression stages into one physical projection.
    */
  final case class Pipeline(fns: Seq[ComputeFn]) {
    def andThen(next: ComputeFn): Pipeline = Pipeline(fns :+ next)
    def eval(in: DataFrame): DataFrame =
      fns.foldLeft(in)((df, fn) => fn.eval(df))
    def eval(in: DataFrame, out: GraftDataset, message: String): String = {
      out.append(eval(in))
      out.commit(message)
    }
  }
}
