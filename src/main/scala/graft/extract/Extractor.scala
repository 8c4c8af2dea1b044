package graft.extract

import graft.corpus.CorpusSynth
import graft.functions.Normalize
import graft.model.{ExtractedGraphDoc, ExtractedNode, ExtractedRel}

/** Extraction interface (reference `common/extractors/BaseExtractor.py:6-13`:
  * `extract(text) -> list[GraphDocument]`). Implementations MUST be cheap to
  * construct or pooled per partition — the pipeline calls them inside
  * `mapPartitions`, mirroring the reference's 20-way pooled extract workers
  * (`ecc/app/graphrag/workers.py:220-236`).
  *
  * Failure contract: any unparseable input yields an EMPTY result (no nodes,
  * no rels) — never an error — matching
  * `LLMEntityRelationshipExtractor.py:142-143`. Drops are counted by the
  * lineage stage, not hidden (SURVEY.md §4).
  */
trait Extractor extends Serializable {
  def extract(chunkId: String, text: String): ExtractedGraphDoc
}

/** Deterministic rule-based extractor recovering the synthesizer's planted
  * sentences (FIXTURES.md §4). Normalization applied exactly where the
  * reference applies it in the extractor:
  * relation types upper+underscore (`LLMEntityRelationshipExtractor.py:64`),
  * node types capitalize+underscore (`:108`). Entity ids are left in surface
  * form here — `process_id` happens downstream in assembly, as in
  * `ecc/app/graphrag/workers.py:250,350,374`.
  */
final class RuleExtractor extends Extractor {
  // fact first: verbs like "is located in" must not be eaten by the
  // definition pattern ("<x> is <desc>").
  @transient private lazy val factRe = {
    val alts = CorpusSynth.Verbs.map(v => java.util.regex.Pattern.quote(v._1)).mkString("|")
    s"^(.+?) ($alts) (.+)\\.$$".r
  }
  @transient private lazy val defRe = "^(.+?) is ((?:a|an|the) )?(.+)\\.$".r

  override def extract(chunkId: String, text: String): ExtractedGraphDoc = text.trim match {
    case factRe(subj, verb, obj) =>
      ExtractedGraphDoc(chunkId, Nil,
        Seq(ExtractedRel(subj, obj, Normalize.relationType(verb), "")))
    case defRe(id, art, desc) =>
      val definition = Option(art).getOrElse("") + desc
      val cat = categoryOf(desc)
      ExtractedGraphDoc(chunkId,
        Seq(ExtractedNode(id, Normalize.nodeType(cat), definition)), Nil)
    case _ => ExtractedGraphDoc(chunkId, Nil, Nil) // parse failure → empty
  }

  /** Deterministic node category. The synthesizer encodes the category in the
    * description's word count parity-free way — instead we derive it from the
    * definition deterministically (stable hash), which is all the type-graph
    * stage needs: a consistent type per entity.
    */
  private def categoryOf(desc: String): String = {
    val h = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(desc.split(" ").head), 3)
    h match { case 0 => "person"; case 1 => "organization"; case _ => "place" }
  }
}
