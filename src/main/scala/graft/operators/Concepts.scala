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

  // ------------------------------------------------- concept tree (r4, Q8)

  /** Entity/relationship cover of every concept, composite concepts
    * resolved bottom-up through IS_CHILD_OF — the set each concept
    * "describes" (`getEntityRelationshipConceptCooccurrence.gsql:1-139`
    * computes exactly this per concept: descend to leaves, 1-hop to
    * Entity|Relationship, then AND-parents INTERSECT their children's sets
    * and OR/other parents UNION them).
    *
    * Spark realization: a bottom-up level sweep instead of the reference's
    * per-concept BFS — each round resolves every concept whose children are
    * all resolved, as ONE grouped aggregate: a member belongs to an AND
    * parent iff it appears in all `n_children` child covers (count ==
    * n_children), to an OR parent iff it appears in any (count >= 1). Tree
    * depth bounds the loop; each round is a bounded equi-join, never a
    * per-pair traversal.
    *
    * @param concepts    (concept_id, concept_type) — "AND"/"OR" mark
    *                    composite combinators, anything else is a leaf type
    * @param isChildOf   (child_id, parent_id)
    * @param leafMembers (concept_id, member_id) — DESCRIBES edges of leaves
    * @return (concept_id, member_id) for EVERY concept, composites included
    */
  def conceptCover(concepts: DataFrame, isChildOf: DataFrame,
      leafMembers: DataFrame): DataFrame = {
    val spark = concepts.sparkSession
    import spark.implicits._
    val children = isChildOf.select($"child_id", $"parent_id").localCheckpoint(true)
    val nChildren = children.groupBy($"parent_id")
      .agg(count(lit(1)).as("n_children")).localCheckpoint(true)
    // resolved-ness is tracked by ID, not by presence of cover rows: a leaf
    // (or an AND of disjoint children) can have an EMPTY cover and must
    // still unblock its parent
    var resolvedIds = concepts.select($"concept_id")
      .join(children.select($"parent_id".as("concept_id")).distinct(),
        Seq("concept_id"), "left_anti") // leaves = concepts with no children
      .localCheckpoint(true)
    var resolved = leafMembers
      .select($"concept_id", $"member_id").distinct().localCheckpoint(true)
    var frontierDone = false
    var guard = 0
    while (!frontierDone && guard < 64) { // 64 = sanity bound >> any real tree depth
      guard += 1
      // parents not yet resolved whose children are ALL resolved this round
      val pending = nChildren
        .join(resolvedIds.withColumnRenamed("concept_id", "parent_id"),
          Seq("parent_id"), "left_anti")
      val childCounts = children
        .join(pending, "parent_id")
        .join(resolvedIds.withColumnRenamed("concept_id", "child_id"), "child_id")
        .groupBy($"parent_id", $"n_children")
        .agg(count(lit(1)).as("n_resolved"))
        .where($"n_resolved" === $"n_children")
        .select($"parent_id", $"n_children")
      val ready = childCounts
        .join(concepts.withColumnRenamed("concept_id", "parent_id"), "parent_id")
        .localCheckpoint(true)
      if (ready.isEmpty) frontierDone = true
      else {
        val memberVotes = children.join(ready, "parent_id")
          .join(resolved.withColumnRenamed("concept_id", "child_id"), "child_id")
          .groupBy($"parent_id", $"member_id", $"concept_type", $"n_children")
          .agg(count(lit(1)).as("votes"))
        val newRows = memberVotes
          .where(when($"concept_type" === "AND", $"votes" === $"n_children")
            .otherwise($"votes" >= 1)) // OR and any other combinator = union
          .select($"parent_id".as("concept_id"), $"member_id")
        resolved = resolved.unionByName(newRows).localCheckpoint(true)
        resolvedIds = resolvedIds
          .unionByName(ready.select($"parent_id".as("concept_id")))
          .localCheckpoint(true)
      }
    }
    resolved
  }

  /** All-pairs concept co-occurrence — the loop body of
    * `Build_Concept_Tree.gsql:8-20` without its O(n²) per-pair subquery
    * calls: ONE inverted-index self-join on member_id counts |cover(a) ∩
    * cover(b)| for every same-type root pair simultaneously (the exact
    * number `getEntityRelationshipConceptCooccurrence` returns per pair).
    * Only roots (no IS_CHILD_OF parent) pair up, as in the reference.
    * `maxMemberFreq` caps the inverted-index fanout for web-scale member
    * sets — a member in > that many concepts contributes quadratic pairs
    * and is dropped (cap mirrored in any oracle).
    * Output: (a, b, concept_type, cooccurrence) with a < b.
    */
  def conceptCooccurrence(concepts: DataFrame, isChildOf: DataFrame,
      cover: DataFrame, maxMemberFreq: Int = 10000): DataFrame = {
    val spark = concepts.sparkSession
    import spark.implicits._
    val roots = concepts
      .join(isChildOf.select($"child_id".as("concept_id")).distinct(),
        Seq("concept_id"), "left_anti")
    val rootCover = cover.join(roots, "concept_id")
      .select($"concept_id", $"concept_type", $"member_id")
    val capped = rootCover
      .withColumn("mf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"member_id")))
      .where($"mf" <= maxMemberFreq)
      .select($"concept_id", $"concept_type", $"member_id")
    capped.as("x").join(capped.as("y"),
        $"x.member_id" === $"y.member_id" &&
          $"x.concept_type" === $"y.concept_type" &&
          $"x.concept_id" < $"y.concept_id")
      .groupBy($"x.concept_id".as("a"), $"y.concept_id".as("b"),
        $"x.concept_type".as("concept_type"))
      .agg(count(lit(1)).as("cooccurrence"))
  }

  /** `Build_Concept_Tree.gsql:8-31`: same-type root pairs co-occurring ≥
    * `minCooccurrence` times merge under a new parent Concept
    * `"<a>_AND_<b>"` (ids ordered ascending, exactly the reference's
    * `IF c.id <= conc` branch) of concept_type "AND", with IS_CHILD_OF
    * edges from both children. One pass, like the reference; re-run after
    * unioning the outputs to deepen the tree.
    * @return (newConcepts(concept_id, concept_type),
    *          newIsChildOf(child_id, parent_id))
    */
  def buildConceptTree(concepts: DataFrame, isChildOf: DataFrame,
      cover: DataFrame, minCooccurrence: Long = 10): (DataFrame, DataFrame) = {
    val spark = concepts.sparkSession
    import spark.implicits._
    val merged = conceptCooccurrence(concepts, isChildOf, cover)
      .where($"cooccurrence" >= minCooccurrence)
      .select($"a", $"b", concat($"a", lit("_AND_"), $"b").as("parent_id"))
      .localCheckpoint(true)
    val newConcepts = merged.select($"parent_id".as("concept_id"))
      .distinct()
      .withColumn("concept_type", lit("AND"))
    val newEdges = merged.select($"a".as("child_id"), $"parent_id")
      .unionByName(merged.select($"b".as("child_id"), $"parent_id"))
      .distinct()
    (newConcepts, newEdges)
  }
}
