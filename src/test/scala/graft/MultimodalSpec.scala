package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("fixture text is ASCII (oracle's unicode()==byte assumption)") {
    val nonAscii = Tables.documents(spark, sf)
      .filter(length($"text") =!= octet_length($"text".cast("binary")))
      .count()
    assert(nonAscii === 0)
  }

  test("media table carries binary payload + typed metadata") {
    val media = MultimodalOps.mediaTable(spark, sf)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("media") === "binary")
    assert(schema("width") === "integer" && schema("height") === "integer")
    val r = media.head()
    assert(r.media.length.toLong ===
      Tables.documents(spark, sf).filter($"doc_id" === r.doc_id)
        .select($"n_chars").as[Long].head())
  }

  test("partition-wise decode produces deterministic features") {
    val feats = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sf))
    val r = feats.filter(_.doc_id == 0L).head()
    assert(r.n_frames === r.n_bytes / 100 + 1)
    assert(r.mean_byte > 32.0 && r.mean_byte < 127.0)   // printable ASCII
    // decode twice → identical (the stub is deterministic)
    val again = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sf)).filter(_.doc_id == 0L).head()
    assert(r === again)
  }
}
