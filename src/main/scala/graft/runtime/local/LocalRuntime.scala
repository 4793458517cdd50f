package graft.runtime.local

import scala.collection.mutable
import graft.model._
import graft.model.Types._
import graft.flow.FlowRegistry
import graft.runtime.StatefulOperator

/** Synchronous in-memory runtime — the semantics oracle for all scenario
  * tests, mirroring the reference's LocalRuntime
  * (/root/reference/stateflow/util/local_runtime.py:17-96): one event at
  * a time, state in a map keyed by (entity, key), continuations drained
  * to completion before the client reply is returned.
  */
final class LocalRuntime(registry: EntityRegistry) {
  val store: mutable.Map[(String, String), State] = mutable.Map.empty
  private val handler = StatefulOperator.handle(registry) _

  /** Ingress + drain loop (IngressRouter/EgressRouter analog,
    * /root/reference/stateflow/dataflow/dataflow.py:52-210): route the
    * event to its keyed operator, apply the state transition, follow
    * internal continuations until a reply for the root event id appears.
    */
  def send(root: Event): Event = {
    val queue = mutable.Queue(root)
    while (queue.nonEmpty) {
      val ev = queue.dequeue()
      ev.eventType match {
        case _: EventType.Reply =>
          if (ev.eventId == root.eventId) return ev
        // replies for other ids would go to other clients; impossible here
        case _: EventType.Request =>
          val k = (ev.entity, ev.key)
          val (out, newState) = handler(ev, store.get(k))
          newState match {
            case Some(s) => store(k) = s
            case None => store.remove(k)
          }
          queue.enqueueAll(out)
      }
    }
    throw new IllegalStateException(s"no reply produced for ${root.eventId}")
  }
}

/** Client facade (ClassRef/MetaWrapper analog,
  * /root/reference/stateflow/client/class_ref.py:17-258): builds events,
  * derives the create key off-state (two-phase create, SURVEY O7), picks
  * InvokeStateful vs EventFlow per method exactly like the reference's
  * method dispatch (class_ref.py:45-51).
  */
final class LocalClient(registry: EntityRegistry, rt: LocalRuntime) {
  private var n = 0
  private def eid(): String = { n += 1; s"e$n" }

  def create(entity: String, args: Args): Either[String, EntityRef] = {
    val key = registry(entity).keyOf(args) // phase 1: key off-state (O7)
    rt.send(Event(eid(), entity, key, EventType.InitClass, Payload.CreateArgs(args))) match {
      case Event(_, _, _, EventType.SuccessfulCreateClass, _) => Right(EntityRef(entity, key))
      case Event(_, _, _, _, Payload.ErrorMsg(m)) => Left(m)
      case other => Left(other.toString)
    }
  }

  def find(ref: EntityRef): Boolean =
    rt.send(Event(eid(), ref.entity, ref.key, EventType.FindClass, Payload.Empty))
      .eventType == EventType.FoundClass

  def getAttr(ref: EntityRef, attr: String): Any =
    rt.send(Event(eid(), ref.entity, ref.key, EventType.GetState, Payload.AttrGet(attr)))
      .payload.asInstanceOf[Payload.Result].value

  def setAttr(ref: EntityRef, attr: String, value: Any): Unit =
    rt.send(Event(eid(), ref.entity, ref.key, EventType.UpdateState, Payload.AttrSet(attr, value)))

  /** Method call: split methods (registered flows) travel as EventFlow
    * state machines; plain methods as InvokeStateful.
    */
  def call(ref: EntityRef, method: String, args: Args): Any = {
    val flowId = s"${ref.entity}.$method"
    val ev =
      if (FlowRegistry.has(flowId))
        Event(eid(), ref.entity, ref.key, EventType.EventFlow,
          Payload.FlowPayload(FlowRegistry.instantiate(flowId, ref, args)))
      else
        Event(eid(), ref.entity, ref.key, EventType.InvokeStateful,
          Payload.MethodCall(method, args))
    rt.send(ev) match {
      case Event(_, _, _, EventType.SuccessfulInvocation, Payload.Result(v)) => v
      case Event(_, _, _, t, p) =>
        throw new RuntimeException(s"call $flowId failed: $t $p")
    }
  }
}
