package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.model._
import graft.model.Types._
import graft.flow._
import graft.flow.Step._
import graft.flow.FlowModel.SelfE
import graft.runtime.Client
import graft.runtime.local.LocalRuntime

/** Differential property test of the flow compiler + interpreter
  * (SURVEY.md §5 plan item 4): arbitrary programs over a tiny step
  * language are (a) translated to the Step DSL, compiled, and executed
  * through the full LocalRuntime event machinery — multi-entity hops,
  * branch convergence, loop-back edges, early returns — and (b)
  * evaluated by an independent 20-line direct interpreter. Results and
  * final entity states must agree, and every traversal must terminate
  * (the invariant behind event_flow.py:176-180).
  */
trait FlowProgramGen {

  // ------------------------- tiny program AST -------------------------
  sealed trait P
  case class PSet(v: String, c: Int, addVar: Option[String]) extends P
  case class PInvokeAdd(refIdx: Int, amount: Int) extends P
  case class PReadBal(refIdx: Int, into: String) extends P
  case class PBranch(v: String, gt: Int, t: List[P], f: List[P]) extends P
  case class PLoopAdd(amount: Int, into: String) extends P // for each other: add, track last
  case class PRet(v: String) extends P

  protected val vars = Seq("x", "y", "z")
  protected def genP(depth: Int): Gen[P] = {
    val leaf = Gen.oneOf(
      for { v <- Gen.oneOf(vars); c <- Gen.choose(-5, 10)
            av <- Gen.option(Gen.oneOf(vars)) } yield PSet(v, c, av),
      for { r <- Gen.choose(0, 1); a <- Gen.choose(-3, 5) } yield PInvokeAdd(r, a),
      for { r <- Gen.choose(0, 1); v <- Gen.oneOf(vars) } yield PReadBal(r, v),
      for { a <- Gen.choose(1, 4); v <- Gen.oneOf(vars) } yield PLoopAdd(a, v),
      Gen.oneOf(vars).map(PRet))
    if (depth == 0) leaf
    else Gen.frequency(
      4 -> leaf,
      1 -> (for {
        v <- Gen.oneOf(vars); c <- Gen.choose(-2, 8)
        t <- Gen.listOfN(2, genP(depth - 1)); f <- Gen.listOfN(2, genP(depth - 1))
      } yield PBranch(v, c, t, f)))
  }
  protected val genProgram: Gen[List[P]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genP(2)))

  // --------------- translation to the real Step DSL -------------------
  protected def toSteps(prog: List[P]): Seq[Step] = prog.map {
    case PSet(v, c, av) =>
      setVars(env => env + (v ->
        (c + av.map(x => env.getOrElse(x, 0).asInstanceOf[Int]).getOrElse(0))))
    case PInvokeAdd(r, a) =>
      invokeF(env => env("others").asInstanceOf[Seq[EntityRef]](r),
        TestEntities.addBalance, _ => Map("balance" -> a), "_r")
    case PReadBal(r, into) =>
      // snapshot + extract: the RequestState pattern incl. invalidation
      SnapshotS(env => env("others").asInstanceOf[Seq[EntityRef]](r),
        (env, st) => env + (into -> st("balance")))
    case PBranch(v, gt, t, f) =>
      BranchS(SelfE, (_, env) => env.getOrElse(v, 0).asInstanceOf[Int] > gt,
        toSteps(t), toSteps(f))
    case PLoopAdd(a, into) =>
      loop("others", "_it")(
        invokeF(env => env("_it").asInstanceOf[EntityRef],
          TestEntities.addBalance, _ => Map("balance" -> a), "_r"),
        SnapshotS(env => env("_it").asInstanceOf[EntityRef],
          (env, st) => env + (into -> st("balance"))))
    case PRet(v) => ret((_, env) => env.getOrElse(v, 0))
  }

}

class FlowPropertySpec extends AnyFunSuite with FlowProgramGen {

  // --------------- independent direct interpreter (oracle) ------------
  private def direct(prog: List[P], bal: Array[Int], env0: Map[String, Int]): (Any, Array[Int]) = {
    var env = env0
    def run(ps: List[P]): Option[Any] = ps match {
      case Nil => None
      case p :: rest =>
        val early: Option[Any] = p match {
          case PSet(v, c, av) =>
            env += (v -> (c + av.map(env.getOrElse(_, 0)).getOrElse(0))); None
          case PInvokeAdd(r, a) => bal(r) += a; None
          case PReadBal(r, into) => env += (into -> bal(r)); None
          case PBranch(v, gt, t, f) =>
            if (env.getOrElse(v, 0) > gt) run(t) else run(f)
          case PLoopAdd(a, into) =>
            (0 until bal.length).foreach { i => bal(i) += a; env += (into -> bal(i)) }
            None
          case PRet(v) => Some(env.getOrElse(v, 0))
        }
        early.orElse(run(rest))
    }
    (run(prog).orNull, bal)
  }


  test("random flows: full runtime == direct interpreter, always terminates") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    for (n <- 1 to 200) {
      val prog = genProgram.pureApply(params, seed)
      seed = seed.next
      val flowId = s"ExperimentalA.prop_$n"
      FlowRegistry.register(FlowDef(flowId, Seq("others"), toSteps(prog)))

      val rt = new LocalRuntime(TestEntities.registry)
      val c = new Client(TestEntities.registry, rt)
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      val Right(b0) = c.create("ExperimentalB", Map("name" -> "b0"))
      val Right(b1) = c.create("ExperimentalB", Map("name" -> "b1"))
      val got = c.call(a, s"prop_$n", Map("others" -> Seq(b0, b1)))

      val (want, wantBal) = direct(prog, Array(0, 0), Map.empty)
      assert(got === want, s"result mismatch for $prog")
      assert(c.getAttr(b0, "balance") === wantBal(0), s"b0 state for $prog")
      assert(c.getAttr(b1, "balance") === wantBal(1), s"b1 state for $prog")
    }
  }

  test("random NESTED flows: compile-time inlining == direct interpretation") {
    // Caller shape: run a random prefix, call a random CALLEE FLOW on
    // self (sub-env inlining, callee sees the same others), bind its
    // result into "x", run a random suffix. Oracle = direct eval of
    // prefix ++ [callee-as-inline] ++ suffix with the same binding rule.
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    for (n <- 1 to 100) {
      def draw(): List[P] = {
        val p = genProgram.pureApply(params, seed); seed = seed.next; p
      }
      val calleeProg = draw()
      val prefix = draw()
      val suffix = draw()
      val calleeId = s"ExperimentalA.callee_$n"
      FlowRegistry.register(FlowDef(calleeId, Seq("others"), toSteps(calleeProg)))
      val callerSteps = toSteps(prefix) ++
        Seq(CallFlowS(env => env("self_ref").asInstanceOf[EntityRef], calleeId,
          env => Map("others" -> env("others")),
          (env, r) => env + ("x" -> (if (r == null) 0 else r)))) ++
        toSteps(suffix)
      FlowRegistry.register(FlowDef(s"ExperimentalA.caller_$n",
        Seq("others", "self_ref"), callerSteps))

      val rt = new LocalRuntime(TestEntities.registry)
      val c = new Client(TestEntities.registry, rt)
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      val Right(b0) = c.create("ExperimentalB", Map("name" -> "b0"))
      val Right(b1) = c.create("ExperimentalB", Map("name" -> "b1"))
      val got = c.call(a, s"caller_$n", Map("others" -> Seq(b0, b1), "self_ref" -> a))

      // direct oracle with the same env-binding semantics
      val bal = Array(0, 0)
      var env = Map.empty[String, Int]
      def directInto(prog: List[P], e: Map[String, Int]): (Option[Any], Map[String, Int]) = {
        var env2 = e
        def run(ps: List[P]): Option[Any] = ps match {
          case Nil => None
          case p :: rest =>
            val early: Option[Any] = p match {
              case PSet(v, cst, av) =>
                env2 += (v -> (cst + av.map(env2.getOrElse(_, 0)).getOrElse(0))); None
              case PInvokeAdd(r, amt) => bal(r) += amt; None
              case PReadBal(r, into) => env2 += (into -> bal(r)); None
              case PBranch(v, gt, t, f) =>
                if (env2.getOrElse(v, 0) > gt) run(t) else run(f)
              case PLoopAdd(amt, into) =>
                bal.indices.foreach { i => bal(i) += amt; env2 += (into -> bal(i)) }
                None
              case PRet(v) => Some(env2.getOrElse(v, 0))
            }
            early.orElse(run(rest))
        }
        (run(prog), env2)
      }
      val (preRet, envAfterPre) = directInto(prefix, env)
      val want: Any = preRet.getOrElse {
        // callee runs in a FRESH env (sub-env semantics)
        val (calleeRet, _) = directInto(calleeProg, Map.empty)
        val x = calleeRet.getOrElse(null)
        env = envAfterPre + ("x" -> (if (x == null) 0 else x.asInstanceOf[Int]))
        val (sufRet, _) = directInto(suffix, env)
        sufRet.orNull
      }
      assert(got === want, s"nested mismatch n=$n pre=$prefix callee=$calleeProg suf=$suffix")
      assert(c.getAttr(b0, "balance") === bal(0), s"b0 n=$n")
      assert(c.getAttr(b1, "balance") === bal(1), s"b1 n=$n")
    }
  }
}
