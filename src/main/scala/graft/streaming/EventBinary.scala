package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputFilter, ObjectInputStream, ObjectOutputStream}
import java.util.Base64
import graft.model.Event

/** Type-preserving binary codec for INTERNAL hop traffic (the loopback /
  * "internal" topic). The reference uses pickle between workers
  * (/root/reference/stateflow/serialization/pickle_serde.py) precisely
  * because internal traffic must round-trip native types exactly;
  * [[EventJson]] with its Python-JSON numeric model is the CLIENT
  * boundary format. Base64 text framing keeps the loopback sink a plain
  * line-oriented file/topic.
  *
  * Decoding runs under an [[ObjectInputFilter]] allowlist (graft model /
  * flow classes, Scala runtime, core JDK value types): anything that can
  * write to the loopback directory — or the internal broker topic in the
  * production swap — would otherwise get arbitrary-gadget
  * deserialization on executors.
  */
object EventBinary {

  /** Allowlist for the event graph: Event/EventType/Payload and flow
    * state (graft.*), Scala collections/boxing (scala.*), JDK value and
    * collection classes. Everything else is rejected before
    * instantiation; the depth/ref bounds stop billion-laughs graphs.
    */
  private val filter: ObjectInputFilter = ObjectInputFilter.Config.createFilter(
    "maxdepth=64;maxrefs=65536;graft.**;scala.**;java.lang.**;java.util.**;java.time.**;!*")

  def encode(ev: Event): String = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(ev)
    oos.close()
    Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  def decode(s: String): Event = {
    val ois = new ObjectInputStream(
      new ByteArrayInputStream(Base64.getDecoder.decode(s)))
    ois.setObjectInputFilter(filter)
    try ois.readObject().asInstanceOf[Event] finally ois.close()
  }
}
