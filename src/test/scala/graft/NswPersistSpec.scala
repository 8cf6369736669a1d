package graft

import java.nio.file.Files

import graft.index.NswIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted NSW layout must serve exactly what the in-memory
  * graph serves: build once, persist, and prove the beam search over
  * the disk layout is row-identical (ids, ranks, scores) to the
  * search over the in-memory edge table. */
class NswPersistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("beam search over the persisted layout equals the in-memory search") {
    val tmp = Files.createTempDirectory("graft_nsw_persist").toFile.getAbsolutePath
    val emb = graft.core.Tables.embeddings(spark, sf)
    val edges = NswIndex.buildEdges(emb)
    NswIndex.persist(emb, edges, tmp)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select($"q_id", $"rank", $"neighbor_id", $"score_e6")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val inMemory = rows(NswIndex.beamSearch(emb, edges, queries))
    val persisted = rows(NswIndex.searchPersisted(spark, tmp, queries))
    assert(persisted == inMemory)
    assert(inMemory.nonEmpty && inMemory.map(_._1).distinct.size == 5)
  }
}
