package graft.bench

import org.apache.spark.sql.SparkSession
import graft.model.{EntityRef, TestEntities}
import graft.runtime.Client
import graft.streaming.StreamingEntityRuntime

/** Runnable demo of the entity runtime over Structured Streaming:
  * the reference's demo_client.py flow (create user/item, update, a
  * two-entity buy_item split flow) plus the error paths, with per-op
  * wall-clock prints (mirroring demo_client.py:19-30).
  */
object EntityDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TestEntities.registerFlows()
    val rt = new StreamingEntityRuntime(TestEntities.registry, spark)
    val c = new Client(TestEntities.registry, rt)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[demo] $label%-28s -> $r (${(System.nanoTime() - t0) / 1e6}%.0f ms)")
      r
    }
    try {
      timed("create User(u1)")(c.create("User", Map("username" -> "u1")))
      timed("create User(u1) again")(c.create("User", Map("username" -> "u1")))
      timed("create Item(i1, price=5)")(c.create("Item", Map("item_name" -> "i1", "price" -> 5)))
      timed("update_balance(+20)")(c.call(EntityRef("User", "u1"), "update_balance", Map("x" -> 20)))
      timed("update_stock(+4)")(c.call(EntityRef("Item", "i1"), "update_stock", Map("amount" -> 4)))
      timed("buy_item(3, i1)")(c.call(EntityRef("User", "u1"), "buy_item",
        Map("amount" -> 3, "item" -> EntityRef("Item", "i1"))))
      timed("balance after buy")(c.getAttr(EntityRef("User", "u1"), "balance"))
      timed("stock after buy")(c.getAttr(EntityRef("Item", "i1"), "stock"))
      timed("set_state (blob replace)")(c.setState(EntityRef("User", "u1"),
        Map("username" -> "u1", "balance" -> 99, "items" -> Seq.empty[EntityRef])))
      timed("balance after set_state")(c.getAttr(EntityRef("User", "u1"), "balance"))
      timed("delete_state(i1)")(c.deleteState(EntityRef("Item", "i1")))
      timed("find(i1) after delete")(c.find(EntityRef("Item", "i1")))
      timed("stateless magnitude_bucket")(c.callStateless("magnitude_bucket", Map("n" -> 4321L)))
      timed("find(missing)")(c.find(EntityRef("User", "ghost")))
      timed("getAttr on missing key")(
        try c.getAttr(EntityRef("User", "ghost"), "balance")
        catch { case e: Exception => s"error: ${e.getMessage.take(60)}" })
    } finally { rt.close(); spark.stop() }
  }
}
