package graft.retrieval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{HashEmbedder, LlmClient}
import graft.pipeline.Catalog

/** Ask one question against a built pipeline catalog through the Q7 driver
  * layer — the CLI face of the reference's `/query` routers
  * (`graphrag/app/routers/supportai.py:147-243`: pick a retriever, run its
  * `retrieve_answer`, return response + retrieved sources).
  *
  * Usage:
  *   graft.retrieval.AskMain --out DIR --question "..."
  *     [--driver similarity|hybrid|community|sibling|entity_rel]
  *     [--topk N] [--hyde] [--expand] [--combine] [--level N] [--cores N]
  *
  * `--out` is a catalog produced by `graft.pipeline.Main`. LLM steps run
  * against [[StandInLlm]] — a deterministic offline stand-in (expansion
  * returns the question, HyDE echoes it, the answer step quotes the top
  * sources); swap in a provider-backed [[LlmClient]] for real deployments,
  * everything else is unchanged. The embedder dimension is read from the
  * catalog's own chunk embeddings so probe vectors always match.
  */
object AskMain {

  /** Deterministic offline completion backend, routed by prompt shape like
    * a provider would be prompted. Question-derived, corpus-agnostic.
    */
  final class StandInLlm extends LlmClient {
    private def slot(prompt: String, key: String): String =
      prompt.split(key, 2) match {
        case Array(_, rest) => rest.split("\n")(0).trim
        case _ => ""
      }
    def complete(prompt: String): String =
      if (prompt.contains("generating 10 new questions")) {
        val q = slot(prompt, "Question: ")
        s"""{"candidates": [{"candidate": ${jsonStr(q)}, "quality_score": 100}]}"""
      } else if (prompt.contains("extracting key terms")) {
        val q = slot(prompt, "Question: ")
        val terms = q.toLowerCase.split("[^a-z0-9_]+").filter(_.length > 3).distinct.take(8)
        val cands = terms.map(t =>
          s"""{"candidate": ${jsonStr(t)}, "quality_score": ${math.min(100, t.length * 10)}}""")
        s"""{"candidates": [${cands.mkString(", ")}]}"""
      } else if (prompt.contains("writing an example of a document"))
        slot(prompt, "question: ")
      else if (prompt.contains("Extract a knowledge graph")) {
        val text = prompt.split("Text:", 2).lift(1).getOrElse(prompt)
        val ids = text.toLowerCase.split("[^a-z0-9_]+").filter(_.length > 3).distinct.take(8)
        val nodes = ids.map(i =>
          s"""{"id": ${jsonStr(i)}, "node_type": "Term", "definition": ""}""")
        s"""{"nodes": [${nodes.mkString(", ")}], "rels": []}"""
      } else if (prompt.contains("generating an answer to the question below using the data provided")) {
        val ctx = slot(prompt, "Context: ")
        s"""{"answer": ${jsonStr(ctx.take(120))}, "quality_score": ${50 + ctx.length % 51}}"""
      } else if (prompt.startsWith("Answer this question:"))
        "[stand-in answer] sources: " + slot(prompt, "Use this information: ").take(200)
      else "{}"
    private def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val out = opts.getOrElse("out", sys.error("--out DIR is required"))
    val question = opts.getOrElse("question", sys.error("--question TEXT is required"))
    val driver = opts.getOrElse("driver", "similarity")
    val topK = opts.getOrElse("topk", "3").toInt
    val cores = opts.getOrElse("cores", "4")
    val level = opts.getOrElse("level", "1").toInt

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cores]"))
      .appName("graft-ask")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cat = new Catalog(out, spark)
    val chunks = cat.read("chunks").localCheckpoint(true)
    val chunkEmb = cat.read("chunk_embeddings").localCheckpoint(true)
    val dim = chunkEmb.select(size(col("embedding"))).head().getInt(0)
    val embed: String => Array[Float] = new HashEmbedder(dim, 42).embed
    val llm = new StandInLlm

    val ans: RetrieverDriver.RetrieverAnswer = driver match {
      case "similarity" =>
        val withEmb = chunkEmb.join(chunks.select(col("chunk_id"), col("text")), "chunk_id")
          .select(col("chunk_id").as("id"), col("embedding"), col("text").as("content"))
        RetrieverDriver.similarityRetrieveAnswer(question, withEmb, chunks,
          cat.read("pages").select(lower(col("url")).as("doc_id"), col("text")),
          cat.read("entities"), cat.read("communities"), llm, embed, topK,
          withHyDE = opts.contains("hyde"), expand = opts.contains("expand"),
          combine = opts.contains("combine"))
      case "hybrid" =>
        val edges = Retrieval.typedEdges(cat.read("triples"),
          cat.read("mentions"), chunks).localCheckpoint(true)
        val entityEmb = cat.read("embeddings")
        RetrieverDriver.hybridRetrieveAnswer(question, edges, entityEmb, chunks,
          cat.read("entities"), llm, embed, topK,
          expand = opts.contains("expand"),
          method = opts.getOrElse("method", "similarity"),
          combine = opts.contains("combine"))
      case "community" =>
        RetrieverDriver.communityRetrieveAnswer(question,
          cat.read("communities").na.fill("", Seq("description")),
          cat.read("community_embeddings"), cat.read("has_parent"),
          cat.read("in_community"), cat.read("resolves_to"),
          cat.read("mentions"), chunks, llm, embed, level, topK,
          expand = opts.contains("expand"), combine = opts.contains("combine"))
      case "sibling" =>
        RetrieverDriver.siblingRetrieveAnswer(question, chunks, chunkEmb, llm,
          embed, topK, withHyDE = opts.contains("hyde"),
          expand = opts.contains("expand"), combine = opts.contains("combine"))
      case "entity_rel" =>
        RetrieverDriver.entityRelationshipRetrieveAnswer(question,
          cat.read("entities"), cat.read("mentions"), chunks,
          cat.read("triples"), llm, topK)
      case other => sys.error(s"unknown --driver $other " +
        "(similarity|hybrid|community|sibling|entity_rel)")
    }

    println(s"question: $question")
    println(s"driver:   $driver (topK=$topK)")
    println(s"retrieved ${ans.retrieved.size} source(s):")
    ans.retrieved.zipWithIndex.foreach { case (src, i) =>
      val oneLine = src.replace("\n", " | ")
      println(f"  [$i%2d] ${oneLine.take(160)}")
    }
    println(s"response: ${ans.response}")
    spark.stop()
  }

  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--hyde" :: rest => parse(rest, acc + ("hyde" -> "true"))
      case "--expand" :: rest => parse(rest, acc + ("expand" -> "true"))
      case "--combine" :: rest => parse(rest, acc + ("combine" -> "true"))
      case k :: v :: rest if k.startsWith("--") => parse(rest, acc + (k.drop(2) -> v))
      case other :: _ => sys.error(s"unrecognized argument: $other")
    }
}
