package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FetchPolicy
import graft.ops.FetchPolicy._

/** Retry-policy decision table (reference tmdb_index.py:369-402). No
  * Spark needed — pure function.
  */
class FetchSpec extends AnyFunSuite {
  private val netErr = Left(new java.io.IOException("timeout"))

  test("2xx succeeds, 404 emits the null row") {
    assert(decide(Right(200), 0) == Succeed)
    assert(decide(Right(201), 4) == Succeed)
    assert(decide(Right(404), 0) == EmitNullRow)
    assert(decide(Right(404), 4) == EmitNullRow)
  }

  test("429 honors Retry-After, else exponential backoff clamped [1,60]") {
    assert(decide(Right(429), 0, Some(42L)) == RetryIn(42))
    assert(decide(Right(429), 0, Some(600L)) == RetryIn(60))
    assert(decide(Right(429), 0, None) == RetryIn(1))
    assert(decide(Right(429), 3, None) == RetryIn(8))
    assert(decide(Right(429), 4, None) == GiveUp) // attempts exhausted
  }

  test("network errors back off, other HTTP errors re-raise immediately") {
    assert(decide(netErr, 0) == RetryIn(1))
    assert(decide(netErr, 2) == RetryIn(4))
    assert(decide(netErr, 4) == GiveUp)
    assert(decide(Right(500), 0) == GiveUp)
    assert(decide(Right(401), 0) == GiveUp)
  }
}
