package graft.runtime.local

import scala.collection.mutable
import graft.model._
import graft.model.Types._
import graft.runtime.{AsyncEventTransport, EventTransport, StatefulOperator}

/** Synchronous in-memory runtime — the semantics oracle for all scenario
  * tests, mirroring the reference's LocalRuntime
  * (/root/reference/stateflow/util/local_runtime.py:17-96): one event at
  * a time, state in a map keyed by (entity, key), continuations drained
  * to completion before the client reply is returned.
  */
final class LocalRuntime(registry: EntityRegistry) extends AsyncEventTransport {
  val store: mutable.Map[(String, String), State] = mutable.Map.empty
  private val handler = StatefulOperator.handle(registry) _
  // async facade over the synchronous machine: replies computed eagerly
  // at sendNoWait, surfaced through the same poll contract the
  // streaming runtime has — so Client async code is runtime-agnostic
  private val stash = mutable.Map.empty[String, Event]

  override def sendNoWait(ev: Event): Unit = stash(ev.eventId) = send(ev)
  override def advance(): Unit = ()
  override def takeReply(eventId: String): Option[Event] =
    stash.remove(eventId)

  /** Ingress + drain loop (IngressRouter/EgressRouter analog,
    * /root/reference/stateflow/dataflow/dataflow.py:52-210): route the
    * event to its keyed operator, apply the state transition, follow
    * internal continuations until a reply for the root event id appears.
    */
  override def send(root: Event): Event = {
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
