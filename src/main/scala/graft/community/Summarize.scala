package graft.community

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** Community description assembly — reference L6/L7 (SURVEY.md §2.8):
  * children of a level-1 community are its member entities' descriptions
  * (`common/gsql/graphrag/get_community_children.gsql:1-12`, post-processed
  * `ecc/app/graphrag/util.py:252-281`: empty-filtered, fallback to the
  * vertex id); children of a level-n community are its child communities'
  * descriptions. Exactly one child → its description verbatim; otherwise a
  * summary (`ecc/app/graphrag/workers.py:506-566`).
  *
  * The reference's summarizer is an LLM behind `community_summarizer.py:39-61`
  * with the community name digit/underscore-stripped (N7); our deterministic
  * stand-in — same interface, one string in, one string out — concatenates
  * the sorted distinct child descriptions. Levels are processed sequentially,
  * the Spark analogue of the reference's per-level completeness barrier
  * (`communities_have_desc.gsql`, `graph_rag.py:440-451`).
  */
object Summarize {

  /** Deterministic stand-in for the LLM community summary. */
  def summarize(name: String, children: Seq[String]): String = {
    val cleanName = Normalize.communityName(name)
    if (children.size == 1) children.head
    else s"$cleanName: " + children.distinct.sorted.mkString(" | ")
  }

  private val summarizeUdf = udf(summarize _)

  /** Descriptions for every community across a hierarchy.
    *
    * @param levels    Louvain hierarchy (level 1 first)
    * @param entities  (entity_id, descriptions: array<string>)
    * @param resolvesTo(entity_id, canonical_id)
    * @return (community_id, iteration, description)
    */
  def describeAll(
      levels: Seq[Louvain.Level],
      entities: DataFrame,
      resolvesTo: DataFrame): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._

    // level-1 children: member entities' first descriptions (empty-filtered,
    // fallback to entity id — util.py:262-266)
    val entityDesc = entities
      .select($"entity_id",
        coalesce(
          try_element_at(array_sort(filter($"descriptions", d => d =!= "")), lit(1)),
          $"entity_id").as("child_desc"))
      .select($"entity_id",
        when($"child_desc" === "", $"entity_id").otherwise($"child_desc").as("child_desc"))

    var childDescs: DataFrame = levels.head.membership // (child_id=canonical, community_id)
      .join(resolvesTo.select($"canonical_id".as("child_id"), $"entity_id"), "child_id")
      .join(entityDesc, "entity_id")
      .select($"community_id", $"child_desc")

    var out: DataFrame = null
    for (lvl <- levels) {
      val described = childDescs
        .groupBy($"community_id")
        .agg(collect_list($"child_desc").as("children"))
        .select($"community_id", lit(lvl.iteration).as("iteration"),
          summarizeUdf($"community_id", $"children").as("description"))
        .transform(graft.Ckpt.local)
      out = if (out == null) described else out.unionByName(described)
      // next level's children are this level's community descriptions
      val nextIdx = lvl.iteration // levels is 1-based; index of next level
      if (nextIdx < levels.size) {
        childDescs = levels(nextIdx).membership
          .join(described.select($"community_id".as("child_id"),
            $"description".as("child_desc")), "child_id")
          .select($"community_id", $"child_desc")
      }
    }
    out
  }
}
