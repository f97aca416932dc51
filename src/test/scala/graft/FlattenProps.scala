package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.JsonApiFlatten

/** Property tests of the reference flatten semantics
  * (flatten_json, etl_tools.py:177-193) on the pure-JVM
  * [[JsonApiFlatten]] walker: every scalar leaf of a random JSON tree
  * appears exactly once under its underscore-joined path
  * (SURVEY.md §5.2).
  */
object FlattenProps extends Properties("flatten") {

  private val f = JsonNodeFactory.instance

  private def leafGen: Gen[JsonNode] = Gen.oneOf(
    Gen.alphaStr.map(f.textNode),
    Gen.chooseNum(-1000L, 1000L).map(f.numberNode),
    Gen.oneOf(true, false).map(f.booleanNode))

  /** Random JSON tree with object keys that are simple identifiers. */
  private def treeGen(depth: Int): Gen[JsonNode] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, treeGen(depth - 1)).map { kids =>
          val arr = f.arrayNode(); kids.foreach(arr.add); arr
        }),
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(
          Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString),
          treeGen(depth - 1))).map { kvs =>
          val obj = f.objectNode()
          kvs.foreach { case (k, v) => obj.set[JsonNode](k, v) }
          obj
        }))

  /** Reference walk: collect (underscore-path, scalar) for every leaf. */
  private def leaves(n: JsonNode, prefix: String): Seq[(String, String)] =
    if (n.isObject)
      n.properties().asScala.toSeq.flatMap(e => leaves(e.getValue,
        if (prefix.isEmpty) e.getKey else s"${prefix}_${e.getKey}"))
    else if (n.isArray)
      n.elements().asScala.toSeq.zipWithIndex.flatMap { case (el, i) =>
        leaves(el, s"${prefix}_$i")
      }
    else if (n.isNull) Seq.empty
    else Seq(prefix -> n.asText())

  property("every scalar leaf appears exactly once under its path") =
    forAll(treeGen(4).suchThat(_.isObject)) { tree =>
      val flat = JsonApiFlatten.flatten(tree)
      val want = leaves(tree, "")
      // duplicate keys in the same object node collapse (last wins in
      // both walks), so compare as maps
      flat.map { case (k, v) => k -> v.asText() } == want.toMap
    }

  property("flatten of a flat object is the identity") =
    forAll(Gen.mapOf(Gen.zip(
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString), leafGen))) { m =>
      val obj = f.objectNode()
      m.foreach { case (k, v) => obj.set[JsonNode](k, v) }
      val flat = JsonApiFlatten.flatten(obj)
      flat.keySet == m.keySet &&
        flat.forall { case (k, v) => v.asText() == m(k).asText() }
    }
}
