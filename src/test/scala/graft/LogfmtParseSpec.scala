package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LogfmtParse

/** Pins the logfmt semantics to the reference's `logfmt` crate behavior on
  * the fortinet sample (SURVEY.md §7.4.1): quoted values with spaces/commas,
  * empty quoted values, bare keys -> null, escapes, last-wins duplicates.
  */
class LogfmtParseSpec extends AnyFunSuite {

  private def parse(s: String, dropNulls: Boolean = false): Map[String, String] = {
    val m = LogfmtParse.parse(UTF8String.fromString(s), dropNulls,
      new java.util.HashSet[String]())
    (0 until m.numElements()).map { i =>
      val k = m.keyArray().getUTF8String(i).toString
      val v = m.valueArray()
      k -> (if (v.isNullAt(i)) null else v.getUTF8String(i).toString)
    }.toMap
  }

  test("basic pairs") {
    assert(parse("a=1 b=two") === Map("a" -> "1", "b" -> "two"))
  }

  test("quoted values with spaces, '=' and commas") {
    assert(parse("""msg="Network.Service: SSL," x="a = b"""") ===
      Map("msg" -> "Network.Service: SSL,", "x" -> "a = b"))
  }

  test("empty quoted value (fortinet user=\"\")") {
    assert(parse("""user="" next=1""") === Map("user" -> "", "next" -> "1"))
  }

  test("empty bare value (key=)") {
    assert(parse("a= b=1") === Map("a" -> "", "b" -> "1"))
  }

  test("bare key has null value; dropNulls removes it (fortinet.rs:85-88)") {
    assert(parse("flag a=1") === Map("flag" -> null, "a" -> "1"))
    assert(parse("flag a=1", dropNulls = true) === Map("a" -> "1"))
  }

  test("escaped quotes and backslashes") {
    assert(parse("""m="say \"hi\"" p="c:\\x"""") ===
      Map("m" -> "say \"hi\"", "p" -> "c:\\x"))
  }

  test("duplicate keys: last wins (serde_json Map insert)") {
    assert(parse("a=1 a=2") === Map("a" -> "2"))
  }

  test("fortinet sample line round-trips (samples/fortinet_log.syslog:1)") {
    val line = """date=2023-07-07 time=14:02:12 devname=FGT60D4Q16025343 devid=FGT60D4Q16025343 logid=1059028704 type=utm subtype=app-ctrl eventtype=app-ctrl-all level=information vd="root" appid=15895 user="" srcip=192.168.1.110 srcport=38348 srcintf="internal" dstip=74.6.231.19 dstport=443 dstintf="wan1" proto=6 service="HTTPS" policyid=1 sessionid=962 applist="default" appcat="Network.Service" app="SSL" action=pass hostname="www.yahoo.com" url="/" msg="Network.Service: SSL," apprisk=elevated"""
    val m = parse(line)
    assert(m("devname") === "FGT60D4Q16025343")
    assert(m("vd") === "root")
    assert(m("user") === "")
    assert(m("srcip") === "192.168.1.110")
    assert(m("msg") === "Network.Service: SSL,")
    assert(m("apprisk") === "elevated")
    assert(m.size === 30)
  }

  test("garbage tolerated") {
    assert(parse("= == =x a=1") === Map("x" -> null, "a" -> "1"))
    assert(parse("") === Map.empty[String, String])
    assert(parse("   ") === Map.empty[String, String])
  }

  test("property: generated kv maps round-trip") {
    val key = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val value = Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const(' ')), (1, Gen.const(',')))).map(_.mkString)
    val kvs = Gen.nonEmptyListOf(Gen.zip(key, value)).map(_.toMap)
    val prop = forAll(kvs) { m =>
      val line = m.map { case (k, v) => s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
        .mkString(" ")
      parse(line) == m
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
