package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{ResolvedTriple, ResolvesTo, Triple, TypeRelationship}

/** Edge lifting and the type-level schema graph — SURVEY.md §2.7 R5 / R6. */
object Lift {

  /** RESOLVED_RELATIONSHIP: the 4-hop GSQL pattern
    * `RE1 ←RESOLVES_TO− E1 −RELATIONSHIP→ E2 −RESOLVES_TO→ RE2`
    * (`common/gsql/graphrag/ResolveRelationships.gsql:13-16`) as two hash
    * joins + distinct. Dedup matches TigerGraph's edge-PK upsert.
    *
    * Join strategy: the resolves_to mapping (one short row per entity) is
    * explicitly broadcast under a probed row bound — both inputs are
    * localCheckpoint `ExistingRDD`s here, whose absent stats made Catalyst
    * build-hash the 1.2M-row TRIPLE side and sort-merge the second join
    * (measured: 3 exchanges + a 60MB broadcast of the wrong side). With the
    * mapping broadcast on both hops the stage is map-side until the single
    * dedup exchange. Beyond the bound (a 10^12-doc entity table) the probe
    * falls back to shuffle joins, where AQE's skew split handles hot
    * canonical entities.
    */
  def resolvedTriples(triples: Dataset[Triple], resolvesTo: Dataset[ResolvesTo],
      maxBroadcastRows: Long = 2000000L): Dataset[ResolvedTriple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val res0 = resolvesTo.toDF()
    val small = res0.limit((maxBroadcastRows + 1).toInt).count() <= maxBroadcastRows
    val res = if (small) broadcast(res0) else res0
    triples.toDF()
      .join(res.select($"entity_id".as("subj"), $"canonical_id".as("subj_c")), "subj")
      .join(res.select($"entity_id".as("obj"), $"canonical_id".as("obj_c")), "obj")
      .select($"subj_c".as("subj"), $"pred", $"obj_c".as("obj"))
      .dropDuplicates("subj", "pred", "obj")
      .as[ResolvedTriple]
  }

  /** RELATIONSHIP_TYPE with frequency
    * (`common/gsql/supportai/create_entity_type_relationships.gsql:1-19`):
    * per (subject's type, relation_type, object's type), counting DISTINCT
    * RELATIONSHIP edges (TigerGraph dedups them by PK before the GSQL runs),
    * excluding DOC_CHUNK_COOCCURRENCE. Divergence, documented: the reference
    * writes each subject-entity's own count into the same edge PK
    * (last-write-wins race); we SUM across subjects, which is the
    * deterministic, order-independent total.
    */
  def typeRelationships(triples: Dataset[Triple], entityTypes: DataFrame,
      maxBroadcastRows: Long = 2000000L): Dataset[TypeRelationship] = {
    val spark = triples.sparkSession
    import spark.implicits._
    // same probed-broadcast rationale as [[resolvedTriples]]: the type map
    // is one short row per (entity, type) — checkpoint inputs carry no stats
    val small = entityTypes.limit((maxBroadcastRows + 1).toInt).count() <= maxBroadcastRows
    val et = if (small) broadcast(entityTypes) else entityTypes
    triples.toDF()
      .where($"pred" =!= GraphAssembly.CoOccurrencePred)
      .dropDuplicates("subj", "pred", "obj")
      .join(et.select($"entity_id".as("subj"), $"type_id".as("src_type")), "subj")
      .join(et.select($"entity_id".as("obj"), $"type_id".as("dst_type")), "obj")
      .groupBy($"src_type", $"pred".as("relation_type"), $"dst_type")
      .agg(count(lit(1)).as("frequency"))
      .as[TypeRelationship]
  }
}
