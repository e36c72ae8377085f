package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The registration gate must be idempotent for graft's OWN functions (no
  * replace-warn spam per query) but must NOT silently keep a foreign
  * occupant: a user UDF squatting on a graft name would make every query
  * run the wrong implementation with no signal.
  */
class RegisterGateSpec extends AnyFunSuite with SparkFixture {

  test("registerOnce replaces a foreign occupant under a graft name") {
    val id = FunctionIdentifier("graft_minhash_sig")
    val reg = spark.sessionState.functionRegistry
    val graftClass = classOf[MinhashSigExpr].getName
    try {
      spark.udf.register("graft_minhash_sig", (s: String) => s.length)
      val occupied = reg.lookupFunction(id).map(_.getClassName).getOrElse("")
      assert(occupied != graftClass)
      MinhashSigExpr.register(spark)
      assert(reg.lookupFunction(id).map(_.getClassName).contains(graftClass),
        "foreign occupant was not replaced")
      // re-register is a no-op once graft's own implementation is in place
      MinhashSigExpr.register(spark)
      assert(reg.lookupFunction(id).map(_.getClassName).contains(graftClass))
      // and the function actually computes (not a stale builder)
      val n = spark.sql("SELECT size(graft_minhash_sig('a b c d e')) AS k")
        .collect()(0).getInt(0)
      assert(n > 0)
    } finally {
      // restore graft's registration for any later suite in this session
      MinhashSigExpr.register(spark)
    }
  }
}
