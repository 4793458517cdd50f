package graft.runtime

import graft.model._
import graft.model.Types._
import graft.flow.FlowRegistry

/** A runtime that accepts a request event and eventually produces the
  * reply for it (the future-based request/reply contract of the
  * reference client, /root/reference/stateflow/client/future.py:31-124).
  */
trait EventTransport {
  def send(ev: Event): Event
}

/** Runtime-agnostic client facade (ClassRef/MetaWrapper analog,
  * /root/reference/stateflow/client/class_ref.py:17-258): builds events,
  * derives the create key off-state (two-phase create, SURVEY O7), picks
  * InvokeStateful vs EventFlow per method exactly like the reference's
  * method dispatch (class_ref.py:45-51). Works identically over the
  * LocalRuntime and the Structured Streaming runtime.
  */
final class Client(registry: EntityRegistry, transport: EventTransport) {
  private var n = 0
  private def eid(): String = synchronized { n += 1; s"e$n-${System.nanoTime()}" }

  def create(entity: String, args: Args): Either[String, EntityRef] = {
    val key = registry(entity).keyOf(args) // phase 1: key off-state (O7)
    transport.send(Event(eid(), entity, key, EventType.InitClass, Payload.CreateArgs(args))) match {
      case Event(_, _, _, EventType.SuccessfulCreateClass, _) => Right(EntityRef(entity, key))
      case Event(_, _, _, _, Payload.ErrorMsg(m)) => Left(m)
      case other => Left(other.toString)
    }
  }

  def find(ref: EntityRef): Boolean =
    transport.send(Event(eid(), ref.entity, ref.key, EventType.FindClass, Payload.Empty))
      .eventType == EventType.FoundClass

  def getAttr(ref: EntityRef, attr: String): Any =
    transport.send(Event(eid(), ref.entity, ref.key, EventType.GetState, Payload.AttrGet(attr))) match {
      case Event(_, _, _, EventType.SuccessfulStateRequest, Payload.Result(v)) => v
      case Event(_, _, _, t, p) =>
        throw new NoSuchElementException(s"getAttr($ref.$attr) failed: $t $p")
    }

  def setAttr(ref: EntityRef, attr: String, value: Any): Unit =
    transport.send(Event(eid(), ref.entity, ref.key, EventType.UpdateState,
      Payload.AttrSet(attr, value)))

  def setState(ref: EntityRef, state: Types.State): Unit =
    transport.send(Event(eid(), ref.entity, ref.key, EventType.SetState,
      Payload.StateSet(state)))

  def deleteState(ref: EntityRef): Unit =
    transport.send(Event(eid(), ref.entity, ref.key, EventType.DeleteState, Payload.Empty))

  def callStateless(name: String, args: Args): Any =
    transport.send(Event(eid(), "_stateless", name, EventType.InvokeStateless,
      Payload.MethodCall(name, args))) match {
      case Event(_, _, _, EventType.SuccessfulInvocation, Payload.Result(v)) => v
      case Event(_, _, _, t, p) => throw new RuntimeException(s"stateless $name failed: $t $p")
    }

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
    transport.send(ev) match {
      case Event(_, _, _, EventType.SuccessfulInvocation, Payload.Result(v)) => v
      case Event(_, _, _, t, p) =>
        throw new RuntimeException(s"call $flowId failed: $t $p")
    }
  }
}
