package graft.flow

import graft.flow.FlowModel._

/** Graphviz DOT rendering of compiled flow templates — the analog of the
  * reference's dataflow visualizer
  * (/root/reference/stateflow/util/dataflow_visualizer.py:13-136).
  * Debug/ops tool: `println(FlowVisualizer.toDot(FlowRegistry.template(id)))`.
  */
object FlowVisualizer {

  def toDot(t: FlowTemplate): String = {
    def ownerLabel(o: OwnerSel): String = o match {
      case SelfE => "self"
      case Other(_) => "ref"
    }
    val nodes = t.nodes.values.toSeq.sortBy(_.id).map {
      case Start(id, _) =>
        s"""  n$id [label="start", shape=circle];"""
      case Exec(id, o, _, _) =>
        s"""  n$id [label="exec@${ownerLabel(o)}", shape=box];"""
      case Branch(id, o, _, _, _) =>
        s"""  n$id [label="branch@${ownerLabel(o)}", shape=diamond];"""
      case Loop(id, _, _, _, _) =>
        s"""  n$id [label="for", shape=hexagon];"""
      case Ret(id, o, _) =>
        s"""  n$id [label="return@${ownerLabel(o)}", shape=doublecircle];"""
    }
    val edges = t.nodes.values.toSeq.sortBy(_.id).flatMap {
      case Start(id, next) => Seq(s"  n$id -> n$next;")
      case Exec(id, _, _, next) => Seq(s"  n$id -> n$next;")
      case Branch(id, _, _, ifT, ifF) =>
        Seq(s"""  n$id -> n$ifT [label="T"];""", s"""  n$id -> n$ifF [label="F"];""")
      case Loop(id, _, _, body, exit) =>
        Seq(s"""  n$id -> n$body [label="next"];""", s"""  n$id -> n$exit [label="done"];""")
      case Ret(_, _, _) => Nil
    }
    (s"""digraph "${t.id}" {""" +: nodes ++: edges :+ "}").mkString("\n")
  }
}
