package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** Reified-triple schema + concept curation — the supportai-flow surface
  * (SURVEY.md §1.1 Relationship / IS_HEAD_OF / HAS_TAIL rows; §2.9 Q8).
  *
  * The supportai flow stores each triple as a Relationship VERTEX with
  * IS_HEAD_OF (Entity → Relationship) and HAS_TAIL (Relationship → Entity)
  * edges (`common/gsql/supportai/SupportAI_Schema.gsql:22,28-29`). Concept
  * curation (`common/gsql/concept_curation/concept_creation/
  * Build_Entity_Concepts.gsql:1-30`) then derives, for every
  * RELATIONSHIP_LEAF concept, two ENTITY_LEAF concepts
  * ("EntitiesAreHeadOf<cid>" / "EntitiesAreTailOf<cid>") describing the
  * head/tail entity sets of the relationships the concept covers.
  */
object Concepts {

  /** Reify (subj, pred, obj) triples into the supportai vertex/edge form.
    * rel_id follows the reference's id discipline (process_id-safe parts
    * joined — the reference builds Relationship PKs from the triple text).
    * Returns (relationships, isHeadOf, hasTail).
    */
  def reify(triples: Dataset[Triple]): (DataFrame, DataFrame, DataFrame) = {
    val spark = triples.sparkSession
    import spark.implicits._
    val rels = triples.toDF()
      .select($"subj", $"pred", $"obj")
      .distinct()
      .withColumn("rel_id", concat_ws("__", $"subj", $"pred", $"obj"))
      .localCheckpoint(true)
    val relationships = rels.select($"rel_id", $"pred".as("short_name"))
    val isHeadOf = rels.select($"subj".as("entity_id"), $"rel_id")
    val hasTail = rels.select($"rel_id", $"obj".as("entity_id"))
    (relationships, isHeadOf, hasTail)
  }

  /** Q8 `Build_Entity_Concepts`: for each RELATIONSHIP_LEAF concept (a
    * concept row (concept_id, rel_id) describing relationship vertices),
    * emit the two derived ENTITY_LEAF concepts plus DESCRIBES_ENTITY edges
    * to every head / tail entity of the described relationships.
    *
    * @param describesRelationship (concept_id, rel_id)
    * @return (concepts(concept_id, concept_type),
    *          describesEntity(concept_id, entity_id))
    */
  def buildEntityConcepts(
      describesRelationship: DataFrame,
      isHeadOf: DataFrame,
      hasTail: DataFrame): (DataFrame, DataFrame) = {
    val spark = describesRelationship.sparkSession
    import spark.implicits._

    val concepts = describesRelationship.select($"concept_id").distinct()
      .select(explode(array(
        concat(lit("EntitiesAreHeadOf"), $"concept_id"),
        concat(lit("EntitiesAreTailOf"), $"concept_id"))).as("concept_id"))
      .withColumn("concept_type", lit("ENTITY_LEAF"))

    val heads = describesRelationship
      .join(isHeadOf, "rel_id")
      .select(concat(lit("EntitiesAreHeadOf"), $"concept_id").as("concept_id"),
        $"entity_id")
    val tails = describesRelationship
      .join(hasTail, "rel_id")
      .select(concat(lit("EntitiesAreTailOf"), $"concept_id").as("concept_id"),
        $"entity_id")
    (concepts, heads.unionByName(tails).distinct())
  }

  /** Q8 `Build_Community_Concepts`
    * (`concept_creation/Build_Community_Concepts.gsql:1-47`): connected
    * components over a chosen vertex/edge set by min-id label propagation
    * (the reference's `WHILE S.size()>0 … t.@min_cc_id += s.@min_cc_id`
    * loop IS our CC primitive, with the deterministic min entity id in
    * place of the load-order `getvid`); components with size in
    * [minSize, maxSize] become `InCommunity<compId>` COMMUNITY_LEAF
    * concepts with DESCRIBES_ENTITY membership.
    */
  def buildCommunityConcepts(nodes: DataFrame, edges: DataFrame,
      minSize: Long = 2, maxSize: Long = 100): (DataFrame, DataFrame) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val comps = graft.resolve.Resolution.connectedComponents(
      nodes.select(col(nodes.columns.head).as("entity_id")), edges)
    val sized = comps.groupBy($"component_id")
      .agg(count(lit(1)).as("sz"))
      .where($"sz".between(minSize, maxSize))
      .select($"component_id")
    val members = comps.join(sized, "component_id")
      .select(concat(lit("InCommunity"), $"component_id").as("concept_id"),
        $"entity_id")
    val concepts = members.select($"concept_id").distinct()
      .withColumn("concept_type", lit("COMMUNITY_LEAF"))
    (concepts, members)
  }

  /** Seed RELATIONSHIP_LEAF concepts: one per relation type — the curation
    * flow's usual starting ontology (a concept covering every relationship
    * of that type).
    */
  def conceptsPerRelationType(relationships: DataFrame): DataFrame = {
    val spark = relationships.sparkSession
    import spark.implicits._
    relationships.select(
      concat(lit("rel_type_"), lower($"short_name")).as("concept_id"),
      $"rel_id")
  }
}
