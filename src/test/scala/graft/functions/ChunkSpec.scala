package graft.functions

import graft.SparkSuite

/** `text_chunk` — chunk-grid geometry and exact coverage against the
  * independently computed token counts at sf0.001. */
class ChunkSpec extends SparkSuite {

  test("chunk grid tiles every document exactly") {
    val chunks = TextQueries.textChunk(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    val nTok = TextQueries.textTokens(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, rows) =>
      val n = nTok(docId)
      val sorted = rows.sortBy(_.getInt(1))
      // chunk ids contiguous from 0; starts on the stride grid
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i)
        assert(r.getInt(2) == i * TextQueries.ChunkStride)
        assert(r.getInt(3) >= 1 && r.getInt(3) <= TextQueries.ChunkWin)
      }
      // expected chunk count for n tokens on a stride grid
      assert(sorted.length == (n - 1) / TextQueries.ChunkStride + 1, s"doc $docId")
      // the last chunk ends exactly at the token count
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) == n, s"doc $docId")
      // every non-final chunk is full-width
      sorted.init.foreach(r => assert(
        r.getInt(3) == math.min(TextQueries.ChunkWin, n - r.getInt(2))))
    }
  }

  test("chunk digest matches a driver-side recompute on sampled docs") {
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(s, sfDir).documents
      .filter(col("doc_id") < 5).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextQueries.textChunk(s, sfDir)
      .filter(col("doc_id") < 5).collect()
    assert(got.nonEmpty)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.foreach { r =>
      val toks = docs(r.getLong(0)).split("\\s+").filter(_.nonEmpty)
      val chunk = toks.slice(r.getInt(2), r.getInt(2) + TextQueries.ChunkWin)
      assert(r.getString(4) == md5hex(chunk.mkString(" ")), s"row $r")
    }
  }
}
