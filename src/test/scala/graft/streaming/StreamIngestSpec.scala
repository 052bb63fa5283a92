package graft.streaming

import graft.{Catalog, SparkSuite}

/** End-to-end identity of the s17 ingest path: JSON file-watch source →
  * validate → 1 s-trigger parquet sink must preserve every field bit-for-
  * bit (the µs-precision timestamp hop through JSON is the risky edge).
  */
class StreamIngestSpec extends SparkSuite {

  test("s17 stream ingest roundtrip preserves the validated event stream exactly") {
    val expected = Streams.validate(Catalog.events(spark, sfDir))
      .orderBy("event_id").collect()
    val got = Streams.streamIngestRoundtrip(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"row mismatch: $g != $e")
    }
  }
}
