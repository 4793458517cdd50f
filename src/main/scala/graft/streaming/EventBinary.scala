package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.util.Base64
import graft.model.Event

/** Type-preserving binary codec for INTERNAL hop traffic (the loopback /
  * "internal" topic). The reference uses pickle between workers
  * (/root/reference/stateflow/serialization/pickle_serde.py) precisely
  * because internal traffic must round-trip native types exactly;
  * [[EventJson]] with its Python-JSON numeric model is the CLIENT
  * boundary format. Base64 text framing keeps the loopback sink a plain
  * line-oriented file/topic.
  */
object EventBinary {

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
    try ois.readObject().asInstanceOf[Event] finally ois.close()
  }
}
