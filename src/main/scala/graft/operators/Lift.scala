package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{ResolvedTriple, ResolvesTo, Triple, TypeRelationship}

/** Edge lifting and the type-level schema graph — SURVEY.md §2.7 R5 / R6. */
object Lift {

  /** RESOLVED_RELATIONSHIP: the 4-hop GSQL pattern
    * `RE1 ←RESOLVES_TO− E1 −RELATIONSHIP→ E2 −RESOLVES_TO→ RE2`
    * (`common/gsql/graphrag/ResolveRelationships.gsql:13-16`) as two hash
    * joins + distinct. The resolves_to mapping is tiny relative to triples
    * (one row per entity), so Spark auto-broadcasts it below the broadcast
    * threshold; above it AQE's skew-join split handles hot canonical
    * entities. Dedup matches TigerGraph's edge-PK upsert.
    */
  def resolvedTriples(triples: Dataset[Triple], resolvesTo: Dataset[ResolvesTo]): Dataset[ResolvedTriple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val res = resolvesTo.toDF()
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
  def typeRelationships(triples: Dataset[Triple], entityTypes: DataFrame): Dataset[TypeRelationship] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.toDF()
      .where($"pred" =!= GraphAssembly.CoOccurrencePred)
      .dropDuplicates("subj", "pred", "obj")
      .join(entityTypes.select($"entity_id".as("subj"), $"type_id".as("src_type")), "subj")
      .join(entityTypes.select($"entity_id".as("obj"), $"type_id".as("dst_type")), "obj")
      .groupBy($"src_type", $"pred".as("relation_type"), $"dst_type")
      .agg(count(lit(1)).as("frequency"))
      .as[TypeRelationship]
  }
}
