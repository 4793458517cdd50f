package graft.model

import graft.model.Types._
import graft.flow._
import graft.flow.Step._

/** The reference's test/demo entity corpus re-expressed in the Step DSL
  * (sources: /root/reference/tests/common/common_classes.py:6-217,
  * /root/reference/demo_ycsb.py:4-30). Split methods are declared as
  * flows with explicit hop points — the Scala stand-in for the
  * reference's AST splitting (SURVEY O22).
  */
object TestEntities {

  private def I(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case other => other.toString.toInt
  }
  private def S(v: Any): State = v.asInstanceOf[State]

  // ------------------------------------------------------------- Item
  val updateStock: Method = Method((st, a) => {
    val amount = I(a("amount")); val stock = I(st("stock"))
    if (stock + amount < 0) (st, false) // can't go negative
    else (st + ("stock" -> (stock + amount)), true)
  })
  val item: EntityType = EntityType("Item",
    keyOf = a => a("item_name").toString,
    init = a => Map("item_name" -> a("item_name"), "stock" -> 0, "price" -> I(a("price"))),
    methods = Map("update_stock" -> updateStock))

  // ------------------------------------------------------------- User
  val updateBalance: Method = Method((st, a) =>
    (st + ("balance" -> (I(st("balance")) + I(a("x")))), null))
  val user: EntityType = EntityType("User",
    keyOf = a => a("username").toString,
    init = a => Map("username" -> a("username"), "balance" -> 0,
      "items" -> Seq.empty[EntityRef]),
    methods = Map("update_balance" -> updateBalance))

  // --------------------------------------------------- ExperimentalB
  val addBalance: Method = Method((st, a) =>
    (st + ("balance" -> (I(st("balance")) + I(a("balance")))), null))
  val setBalance: Method = Method((st, a) =>
    (st + ("balance" -> I(a("balance"))), null))
  val balanceEqualTo: Method = Method((st, a) =>
    (st, I(st("balance")) == I(a("equal_balance"))), readOnly = true)
  val expB: EntityType = EntityType("ExperimentalB",
    keyOf = a => a("name").toString,
    init = a => Map("name" -> a("name"), "balance" -> 0),
    methods = Map("add_balance" -> addBalance, "set_balance" -> setBalance,
      "balance_equal_to" -> balanceEqualTo))

  // --------------------------------------------------- ExperimentalA
  val expA: EntityType = EntityType("ExperimentalA",
    keyOf = a => a("name").toString,
    init = a => Map("name" -> a("name"), "balance" -> 0),
    methods = Map.empty)

  // --------------------------------------------------- NestClass pair
  val isReallyTrue: Method = Method((st, _) => (st, true), readOnly = true)
  val otherNest: EntityType = EntityType("OtherNestClass",
    keyOf = a => a("id").toString,
    init = a => Map("id" -> a("id"), "x" -> I(a("x"))),
    methods = Map("is_really_true" -> isReallyTrue))
  val nest: EntityType = EntityType("NestClass",
    keyOf = a => a("id").toString,
    init = a => Map("id" -> a("id"), "x" -> I(a("x"))),
    methods = Map.empty)

  // --------------------------------------------------------- YCSB
  val ycsbRead: Method = Method((st, _) => (st, Seq(st("key"), st("value"))), readOnly = true)
  val ycsbUpdate: Method = Method((st, a) => (st + ("value" -> I(a("new_value"))), null))
  val ycsbAddFunds: Method = Method((st, a) =>
    (st + ("value" -> (I(st("value")) + I(a("transfer_amount")))), null))
  val ycsb: EntityType = EntityType("YCSBEntity",
    keyOf = a => a("key").toString,
    init = a => Map("key" -> a("key"), "value" -> I(a("value"))),
    methods = Map("read" -> ycsbRead, "update" -> ycsbUpdate, "add_funds" -> ycsbAddFunds))

  /** Stateless functions (reference InvokeStateless surface): pure
    * key-independent helpers callable without routing.
    */
  val statelessFns: Map[String, Args => Any] = Map(
    "magnitude_bucket" -> { a =>
      var v = a("n").asInstanceOf[Number].longValue() + 1; var b = 0
      while (v >= 10 && b < 5) { v /= 10; b += 1 }
      b
    },
    "echo" -> (a => a.getOrElse("msg", null)))

  val registry = new EntityRegistry(Seq(item, user, expB, expA, otherNest, nest, ycsb),
    statelessFns)

  // ================= flows (split methods) ==========================
  // Registration order: callees before callers (inlining).

  private var registered = false
  def registerFlows(): Unit = synchronized {
    if (registered) return
    registered = true

    // User.buy_item (common_classes.py:33-44; S4 expectations
    // stateflow_test.py:184-201)
    FlowRegistry.register(FlowDef("User.buy_item", Seq("amount", "item"), Seq(
      snapshot("item", "isnap"),
      setVars(env => env + ("total" -> I(env("amount")) * I(S(env("isnap"))("price")))),
      branch((st, env) => I(st("balance")) < I(env("total")))(retConst(false))(),
      invoke("item", updateStock, env => Map("amount" -> -I(env("amount"))), "ok"),
      branch((_, env) => env("ok") == false)(retConst(false))(),
      exec((st, env) => (st + ("balance" -> (I(st("balance")) - I(env("total")))), env)),
      retConst(true))))

    // User.simple_for_loops (common_classes.py:46-55; expects i==4)
    FlowRegistry.register(FlowDef("User.simple_for_loops", Seq("users"), Seq(
      setVars(env => env + ("i" -> 0)),
      loop("users", "u")(
        branch((_, env) => I(env("i")) > 0)(
          invoke("u", updateBalance, _ => Map("x" -> 9), "_r"))(
          invoke("u", updateBalance, _ => Map("x" -> 4), "_r")),
        setVars(env => env + ("i" -> (I(env("i")) + 1)))),
      retEnv("i"))))

    // ExperimentalA.complex_method (common_classes.py:85-92)
    FlowRegistry.register(FlowDef("ExperimentalA.complex_method", Seq("balance", "other"), Seq(
      exec((st, env) => (st + ("balance" -> (I(st("balance")) + I(env("balance")) * 2)), env)),
      invoke("other", addBalance, env => Map("balance" -> I(env("balance")) * 2), "_r"),
      exec((st, env) => (st + ("balance" -> (I(st("balance")) - I(env("balance")))), env)),
      invoke("other", addBalance, env => Map("balance" -> -I(env("balance"))), "_r"),
      exec((st, env) => (st + ("balance" -> (I(st("balance")) - I(env("balance")))), env)),
      invoke("other", balanceEqualTo, env => Map("equal_balance" -> env("balance")), "is_equal"),
      retEnv("is_equal"))))

    // ExperimentalA.complex_if (common_classes.py:95-106)
    FlowRegistry.register(FlowDef("ExperimentalA.complex_if", Seq("balance", "b_ins"), Seq(
      exec((st, env) => (st + ("balance" -> env("balance")), env)),
      branch((st, _) => I(st("balance")) > 10)(
        invoke("b_ins", addBalance, env => Map("balance" -> env("balance")), "_r"),
        exec((st, env) => (st + ("balance" -> 0), env)))(
        invoke("b_ins", balanceEqualTo, _ => Map("equal_balance" -> 5), "eq5"),
        branch((_, env) => env("eq5") == true)(
          exec((st, env) => (st + ("balance" -> 1), env)))(
          exec((st, env) => (st + ("balance" -> 2), env)))),
      ret((st, _) => st("balance")))))

    // ExperimentalA.more_complex_if (common_classes.py:108-117)
    FlowRegistry.register(FlowDef("ExperimentalA.more_complex_if", Seq("balance", "b_ins"), Seq(
      exec((st, env) => (st + ("balance" -> env("balance")), env)),
      branch((_, env) => I(env("balance")) >= 0)(
        exec((st, env) => (st + ("balance" -> env("balance")), env)),
        invoke("b_ins", balanceEqualTo, env => Map("equal_balance" -> I(env("balance")) * 2), "eq"),
        branch((_, env) => env("eq") == true)(
          exec((st, env) => (st + ("balance" -> 1), env)))(
          retConst(-1)))(),
      ret((st, _) => st("balance")))))

    // ExperimentalA.test_no_return (common_classes.py:119-124): implicit None
    FlowRegistry.register(FlowDef("ExperimentalA.test_no_return", Seq("balance", "b_ins"), Seq(
      branch((st, env) => I(env("balance")) >= I(st("balance")))(
        exec((st, env) => (st + ("balance" -> 0), env)),
        invoke("b_ins", addBalance, env => Map("balance" -> env("balance")), "_r"))(
        exec((st, env) => (st + ("balance" -> 1), env))))))

    // ExperimentalA.work_with_list (common_classes.py:126-133)
    FlowRegistry.register(FlowDef("ExperimentalA.work_with_list", Seq("x", "others"), Seq(
      setVars(env => env + ("other_one" -> env("others").asInstanceOf[Seq[Any]].head)),
      invoke("other_one", addBalance, _ => Map("balance" -> 10), "_r"),
      branch((_, env) => I(env("x")) > 0)(
        invokeF(env => env("others").asInstanceOf[Seq[Any]].last.asInstanceOf[EntityRef],
          addBalance, _ => Map("balance" -> 10), "_r"))(
        invoke("other_one", addBalance, _ => Map("balance" -> -10), "_r")))))

    // ExperimentalA.for_loops (common_classes.py:135-145; note z escapes
    // the loop like in Python)
    FlowRegistry.register(FlowDef("ExperimentalA.for_loops", Seq("x", "others"), Seq(
      loop("others", "y")(
        invoke("y", addBalance, _ => Map("balance" -> 5), "_r"),
        branch((_, env) => I(env("x")) > 0)(
          setVars(env => env + ("z" -> env("x"))))(
          setVars(env => env + ("z" -> -1)))),
      retEnv("z"))))

    // ExperimentalA.state_requests (common_classes.py:147-167; expects 26).
    // Snapshot placement mirrors the reference's request-state rule: a
    // fresh snapshot after every mutating call to the same entity
    // (split_analyze.py:666-781).
    FlowRegistry.register(FlowDef("ExperimentalA.state_requests", Seq("items"), Seq(
      setVars(env => env ++ Map("total" -> 0,
        "first" -> env("items").asInstanceOf[Seq[Any]].head)),
      snapshot("first", "fs"),
      setVars(env => env + ("total" -> (I(env("total")) + I(S(env("fs"))("balance"))))),
      invoke("first", setBalance, _ => Map("balance" -> 10), "_r"),
      snapshot("first", "fs"),
      setVars(env => env + ("total" -> (I(env("total")) + I(S(env("fs"))("balance"))))),
      invoke("first", setBalance, _ => Map("balance" -> 0), "_r"),
      loop("items", "x")(
        snapshot("x", "xs"),
        setVars(env => env + ("total" -> (I(env("total")) + I(S(env("xs"))("balance"))))),
        invoke("x", setBalance, _ => Map("balance" -> 5), "_r"),
        snapshot("x", "xs"),
        setVars(env => env + ("total" -> (I(env("total")) + I(S(env("xs"))("balance")))))),
      snapshot("first", "fs"),
      setVars(env => env + ("total" -> (I(env("total")) + I(S(env("fs"))("balance"))))),
      branch((_, env) => I(env("total")) > 0)(
        invoke("first", setBalance, _ => Map("balance" -> 1), "_r"))(),
      snapshot("first", "fs"),
      setVars(env => env + ("total" -> (I(env("total")) + I(S(env("fs"))("balance"))))),
      retEnv("total"))))

    // OtherNestClass.is_true (common_classes.py:195-197)
    FlowRegistry.register(FlowDef("OtherNestClass.is_true", Seq("other"), Seq(
      invoke("other", isReallyTrue, _ => Map.empty, "r"),
      retEnv("r"))))

    // OtherNestClass.nest_calll (common_classes.py:199-202) — calls a
    // split callee: compile-time inlining (ExecutionPlanMerger analog)
    FlowRegistry.register(FlowDef("OtherNestClass.nest_calll", Seq("other"), Seq(
      setVars(env => env + ("z" -> 0)),
      callFlow("other", "OtherNestClass.is_true", env => Map("other" -> env("other")), "is_true"),
      retEnv("is_true"))))

    // NestClass.nest_call (common_classes.py:208-216): two-level nesting
    FlowRegistry.register(FlowDef("NestClass.nest_call", Seq("other"), Seq(
      snapshot("other", "os"),
      setVars(env => env ++ Map("y" -> S(env("os"))("x"), "z" -> 3)),
      callFlow("other", "OtherNestClass.nest_calll", env => Map("other" -> env("other")), "r1"),
      branch((_, env) => env("r1") == true)(setVars(env => env + ("p" -> 3)))(),
      callFlow("other", "OtherNestClass.nest_calll", env => Map("other" -> env("other")), "_r2"),
      ret((_, env) => Seq(env("y"), env("z"), env("p"))))))

    // YCSBEntity.transfer (demo_ycsb.py:21-27) — the workload-T flow
    FlowRegistry.register(FlowDef("YCSBEntity.transfer", Seq("transfer_amount", "other_entity"), Seq(
      setVars(env => env + ("_amt" -> I(env("transfer_amount")))),
      branch((st, env) => I(st("value")) - I(env("_amt")) < 0)(retConst(false))(),
      exec((st, env) => (st + ("value" -> (I(st("value")) - I(env("_amt")))), env)),
      invoke("other_entity", ycsbAddFunds,
        env => Map("transfer_amount" -> env("_amt")), "_r"),
      retConst(true))))
  }

  registerFlows()
}
