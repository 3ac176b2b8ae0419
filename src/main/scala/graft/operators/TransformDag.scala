package graft.operators

import org.apache.spark.sql.DataFrame

/** Topologically-executed DAG of named DataFrame transforms — the
  * Dataform model graph (SURVEY §3.2: compile → plan → execute,
  * lineage in docs/lineage.md) as a library. Each node sees the
  * outputs of its dependencies; the runner resolves order, rejects
  * cycles and missing refs, and runs every node exactly once.
  *
  * Execution stays lazy: "running" a node builds its DataFrame; no
  * action is triggered unless a node itself materializes (the
  * incremental sinks in [[TableStore]] do, mirroring per-model jobs).
  */
object TransformDag {

  final case class Node(name: String, deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame)

  /** Returns every node's output, keyed by name. */
  def run(nodes: Seq[Node], sources: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    val byName = nodes.map(n => n.name -> n).toMap
    require(byName.size == nodes.size, "duplicate node names")
    val done = scala.collection.mutable.Map[String, DataFrame]() ++ sources
    val visiting = scala.collection.mutable.Set[String]()

    def visit(name: String): DataFrame = {
      done.get(name) match {
        case Some(df) => df
        case None =>
          val node = byName.getOrElse(name,
            throw new IllegalArgumentException(s"unknown ref: $name"))
          require(visiting.add(name), s"cycle through $name")
          val inputs = node.deps.map(d => d -> visit(d)).toMap
          visiting.remove(name)
          val out = node.build(inputs ++ done)
          done(name) = out
          out
      }
    }

    nodes.foreach(n => visit(n.name))
    done.toMap
  }

  /** Dependency-ordered node names (for reporting / dry runs). */
  def topoOrder(nodes: Seq[Node]): Seq[String] = {
    val order = scala.collection.mutable.ListBuffer[String]()
    val seen = scala.collection.mutable.Set[String]()
    val byName = nodes.map(n => n.name -> n).toMap
    def visit(name: String, stack: Set[String]): Unit =
      if (!seen(name)) {
        require(!stack(name), s"cycle through $name")
        byName.get(name).foreach(_.deps.foreach(visit(_, stack + name)))
        if (seen.add(name)) order += name
      }
    nodes.foreach(n => visit(n.name, Set.empty))
    order.toSeq
  }
}
