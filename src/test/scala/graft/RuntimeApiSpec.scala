package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.flow.{FlowRegistry, FlowVisualizer}
import graft.model._
import graft.runtime.Client
import graft.runtime.local.LocalRuntime

/** Coverage for the remaining event-type surface (SetState, DeleteState,
  * InvokeStateless, Ping) and the flow visualizer.
  */
class RuntimeApiSpec extends AnyFunSuite {

  private def fresh(): (LocalRuntime, Client) = {
    val rt = new LocalRuntime(TestEntities.registry)
    (rt, new Client(TestEntities.registry, rt))
  }

  test("SetState replaces the whole state blob") {
    val (_, c) = fresh()
    val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
    c.setState(b, Map("name" -> "b", "balance" -> 42))
    assert(c.getAttr(b, "balance") === 42)
  }

  test("DeleteState removes the key; create becomes possible again") {
    val (_, c) = fresh()
    val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
    c.deleteState(b)
    assert(!c.find(b))
    assert(c.create("ExperimentalB", Map("name" -> "b")).isRight) // re-creatable
  }

  test("InvokeStateless runs key-independent functions") {
    val (_, c) = fresh()
    assert(c.callStateless("magnitude_bucket", Map("n" -> 12345L)) === 4)
    assert(c.callStateless("echo", Map("msg" -> "hi")) === "hi")
    intercept[RuntimeException](c.callStateless("nope", Map.empty))
  }

  test("flow visualizer renders buy_item with branch/loop/hop structure") {
    val dot = FlowVisualizer.toDot(FlowRegistry.template("User.buy_item"))
    assert(dot.startsWith("digraph \"User.buy_item\""))
    assert(dot.contains("exec@ref"))     // snapshot/invoke on the item
    assert(dot.contains("shape=diamond")) // balance/stock branches
    assert(dot.contains("return@self"))
    val dotLoop = FlowVisualizer.toDot(FlowRegistry.template("ExperimentalA.for_loops"))
    assert(dotLoop.contains("shape=hexagon")) // for node
  }
}
