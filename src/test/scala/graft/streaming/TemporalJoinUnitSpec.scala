package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for TemporalJoin's timestamp↔micros conversion — in
  * the `graft.streaming` package to reach the private[streaming]
  * helpers. The state machine compares event and update times in these
  * micros; truncating to milliseconds would enrich an event with an
  * update from its FUTURE when both fall in the same millisecond. */
class TemporalJoinUnitSpec extends AnyFunSuite {

  test("us/fromUs round-trips sub-millisecond timestamps exactly") {
    val cases = Seq(
      "2026-01-01 10:00:00.000400",
      "2026-01-01 10:00:00.123456",
      "2026-01-01 10:00:00.999999",
      "2026-01-01 10:00:00.0",
      "1999-12-31 23:59:59.000001")
    cases.foreach { c =>
      val t = Timestamp.valueOf(c)
      assert(TemporalJoin.fromUs(TemporalJoin.us(t)) == t, s"round trip broke for $c")
    }
  }

  test("us/fromUs round-trips pre-epoch fractional seconds") {
    // Java's % is sign-preserving: -1000 µs naively splits into
    // (0 s, -1000 µs) and setNanos(-1000000) throws. floorDiv/floorMod
    // split it into (-1 s, +999000 µs) = 23:59:59.999.
    val cases = Seq(
      "1969-12-31 23:59:59.999",
      "1969-12-31 23:59:59.000001",
      "1969-12-31 23:59:59.9999",
      "1969-06-15 12:00:00.5",
      "1900-01-01 00:00:00.123456")
    cases.foreach { c =>
      val t = Timestamp.valueOf(c)
      assert(TemporalJoin.fromUs(TemporalJoin.us(t)) == t, s"round trip broke for $c")
    }
  }

  test("sub-millisecond ordering survives the conversion") {
    val ev = Timestamp.valueOf("2026-01-01 10:00:00.000400")
    val up = Timestamp.valueOf("2026-01-01 10:00:00.000900")
    // the update is strictly AFTER the event; a millis-truncating
    // conversion would make them equal and match the event to it
    assert(TemporalJoin.us(up) > TemporalJoin.us(ev))
    assert(TemporalJoin.us(up) - TemporalJoin.us(ev) == 500L)
  }
}
