package graft

import org.apache.spark.sql.DataFrame

/** Declared-DAG pipeline layer — the snapflow ergonomics (named nodes
  * wired to upstream inputs, executed reactively) on top of lazy
  * DataFrames (SURVEY.md §3).
  *
  * A [[Pipeline]] is a map of named stages; each stage declares its
  * dependencies and a function from the dependencies' outputs to its own
  * output. `run` topologically sorts the graph and memoizes each stage's
  * DataFrame, so shared upstreams are built once (Catalyst still fuses
  * the whole thing into one logical plan per sink — stages add zero
  * execution overhead, they only name the graph).
  *
  * Snapflow mapping: stage ~ Node (function + wired inputs), sources ~
  * external storages, the memo map ~ the resolved Graph. Incremental
  * consumption (snapflow's DataBlockLog) maps to Structured Streaming
  * checkpoints — see graft.streaming — or a high-watermark predicate
  * inside a source stage.
  */
final case class Stage(deps: Seq[String], fn: Seq[DataFrame] => DataFrame)

final class Pipeline(stages: Map[String, Stage]) {

  /** Cycle-checked topological evaluation of one target node. */
  def run(target: String, sources: Map[String, DataFrame] = Map.empty): DataFrame = {
    val memo = collection.mutable.Map[String, DataFrame]() ++ sources

    def eval(name: String, path: List[String]): DataFrame = {
      if (path.contains(name))
        throw new IllegalArgumentException(
          s"cycle: ${(name :: path.takeWhile(_ != name)).reverse.mkString(" -> ")} -> $name")
      memo.getOrElseUpdate(name, {
        val st = stages.getOrElse(name,
          throw new NoSuchElementException(s"undeclared stage or source: $name"))
        st.fn(st.deps.map(eval(_, name :: path)))
      })
    }
    eval(target, Nil)
  }

  /** All stage names reachable from (and including) `target`, in
    * dependency-first order — snapflow's resolved execution order.
    */
  def order(target: String): Seq[String] = {
    val seen = collection.mutable.LinkedHashSet[String]()
    def walk(name: String): Unit =
      if (!seen.contains(name)) {
        stages.get(name).foreach(_.deps.foreach(walk))
        seen += name
      }
    walk(target)
    seen.toSeq
  }
}

object Pipeline {
  def apply(stages: (String, Stage)*): Pipeline = new Pipeline(stages.toMap)

  /** Convenience constructors mirroring snapflow's function arities. */
  def source(fn: => DataFrame): Stage = Stage(Nil, _ => fn)
  def map1(dep: String)(fn: DataFrame => DataFrame): Stage =
    Stage(Seq(dep), dfs => fn(dfs.head))
  def map2(d1: String, d2: String)(fn: (DataFrame, DataFrame) => DataFrame): Stage =
    Stage(Seq(d1, d2), dfs => fn(dfs(0), dfs(1)))
}
