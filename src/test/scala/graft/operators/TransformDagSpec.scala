package graft.operators

import graft.{SparkSpec, TestSpark}
import graft.operators.TransformDag.{Node, topoOrder}

class TransformDagSpec extends SparkSpec {

  private def df(n: Int) = {
    import TestSpark.spark.implicits._
    (1 to n).toDF("x")
  }

  test("runs nodes in dependency order, each once") {
    var builds = List.empty[String]
    val nodes = Seq(
      Node("c", Seq("a", "b"), ins => { builds ::= "c"; ins("a").union(ins("b")) }),
      Node("a", Nil, _ => { builds ::= "a"; df(2) }),
      Node("b", Seq("a"), ins => { builds ::= "b"; ins("a") }))
    val out = TransformDag.run(nodes)
    assert(out("c").count() == 4)
    assert(builds.reverse == List("a", "b", "c"))
  }

  test("sources can be injected; unknown refs rejected") {
    val nodes = Seq(Node("t", Seq("src"), ins => ins("src")))
    assert(TransformDag.run(nodes, Map("src" -> df(3)))("t").count() == 3)
    intercept[IllegalArgumentException] { TransformDag.run(nodes) }
  }

  test("cycles rejected") {
    val nodes = Seq(
      Node("a", Seq("b"), ins => ins("b")),
      Node("b", Seq("a"), ins => ins("a")))
    intercept[IllegalArgumentException] { TransformDag.run(nodes) }
  }

  test("topoOrder puts dependencies first") {
    val nodes = Seq(
      Node("z", Seq("y"), ins => ins("y")),
      Node("y", Nil, _ => df(1)))
    assert(topoOrder(nodes) == Seq("y", "z"))
  }
}
