package graft.extract

import graft.functions.Normalize
import graft.model.{ExtractedGraphDoc, ExtractedNode, ExtractedRel}

/** A completion backend: one prompt in, one raw completion out. Implement
  * with a real provider client in production (constructed lazily so the
  * per-partition `mapPartitions` pooling in GraphAssembly.extractAll gives
  * one connection per partition, like the reference's 20-way semaphore pool
  * `ecc/app/graphrag/workers.py:220-236`); tests inject a deterministic
  * fake.
  */
trait LlmClient extends Serializable {
  def complete(prompt: String): String
}

/** E2 — the pluggable LLM graph extractor (reference
  * `common/extractors/LLMEntityRelationshipExtractor.py:27-143`,
  * `GraphExtractor.py:9-70`): prompts a completion backend and parses the
  * KnowledgeGraph JSON the reference's tool schema defines
  * (`common/py_schemas/tool_io_schemas.py:63-90`):
  *
  * {{{
  * {"nodes": [{"id": "...", "node_type": "...", "definition": "..."}],
  *  "rels":  [{"source": "..."|{"id": "..."}, "target": "..."|{"id": "..."},
  *             "relation_type": "...", "definition": "..."}]}
  * }}}
  *
  * Parsing mirrors the reference line-for-line in behavior:
  *   - a ```json fenced block is unwrapped first
  *     (`LLMEntityRelationshipExtractor.py:51-56`);
  *   - rel source/target accept either a bare id string or a Node object
  *     (`:58-100` handles all four combinations);
  *   - relation types are space→underscore UPPER (`:64`), node types
  *     Python-capitalize (`:108`) — via [[Normalize]];
  *   - ANY failure (client error, bad JSON, missing field) yields an empty
  *     GraphDocument, never an exception (`:47-48,142-143`);
  *   - `strict_mode` (r4, `:113-125,216-228`): when enabled, nodes whose
  *     NORMALIZED type is outside `allowedEntityTypes` and rels whose
  *     normalized type is outside `allowedRelationshipTypes` are dropped —
  *     the filter runs on the formatted types exactly like the reference
  *     (after capitalize/upper), each list only filters when non-empty, and
  *     rels are filtered by edge type alone (NOT by surviving endpoints —
  *     reference behavior, preserved deliberately).
  */
final class JsonLlmExtractor(
    client: LlmClient,
    promptTemplate: String = JsonLlmExtractor.DefaultPrompt,
    allowedEntityTypes: Seq[String] = Nil,
    allowedRelationshipTypes: Seq[String] = Nil,
    strictMode: Boolean = false) extends Extractor {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  override def extract(chunkId: String, text: String): ExtractedGraphDoc = {
    try {
      val raw = client.complete(promptTemplate.replace("{input}", text))
      val body =
        if (raw.contains("```")) {
          val parts = raw.split("```", -1)
          if (parts.length > 1) parts(1).stripPrefix("json").trim else raw.trim
        } else raw.trim
      val json = JsonMethods.parse(body)

      def str(v: JValue): Option[String] = v match {
        case JString(s) => Some(s)
        case JObject(fields) => fields.collectFirst { case ("id", JString(s)) => s }
        case _ => None
      }

      val nodes = (json \ "nodes") match {
        case JArray(xs) => xs.flatMap { n =>
          for {
            id <- str(n \ "id")
            nt = str(n \ "node_type").getOrElse("")
            d = str(n \ "definition").orElse(str(n \ "description")).getOrElse("")
          } yield ExtractedNode(id, Normalize.nodeType(nt), d)
        }
        case _ => Nil
      }
      val rels = (json \ "rels") match {
        case JArray(xs) => xs.flatMap { r =>
          for {
            s <- str(r \ "source")
            t <- str(r \ "target")
            rt <- str(r \ "relation_type")
            d = str(r \ "definition").getOrElse("")
          } yield ExtractedRel(s, t, Normalize.relationType(rt), d)
        }
        case _ => Nil
      }
      // strict_mode schema gate (LLMEntityRelationshipExtractor.py:113-125):
      // each allow-list filters only when non-empty, on the normalized types
      val keptNodes =
        if (strictMode && allowedEntityTypes.nonEmpty)
          nodes.filter(n => allowedEntityTypes.contains(n.node_type))
        else nodes
      val keptRels =
        if (strictMode && allowedRelationshipTypes.nonEmpty)
          rels.filter(r => allowedRelationshipTypes.contains(r.relation_type))
        else rels
      ExtractedGraphDoc(chunkId, keptNodes, keptRels)
    } catch {
      case scala.util.control.NonFatal(_) => ExtractedGraphDoc(chunkId, Nil, Nil)
    }
  }
}

object JsonLlmExtractor {
  /** The extraction prompt shape the reference builds via its parser's
    * format instructions — condensed, with the same output contract.
    */
  val DefaultPrompt: String =
    """Extract a knowledge graph from the text below. Respond with ONLY a
      |JSON object {"nodes": [{"id", "node_type", "definition"}],
      |"rels": [{"source", "target", "relation_type", "definition"}]}.
      |Text: {input}""".stripMargin
}
