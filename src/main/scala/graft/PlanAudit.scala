package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for representative queries — the evidence
  * trail for the scale-design claims in ARCHITECTURE.md (pushdown reaches
  * the scan, top-k compiles to TakeOrderedAndProject, dimensions
  * broadcast). Run: sbt "runMain graft.PlanAudit <sfDir> <outFile>". */
object PlanAudit {
  val audited: Seq[String] = Seq(
    "p3_acl_allow",       // ACL predicate pushed to parquet scan
    "q3_top_revenue",     // broadcast joins + TakeOrderedAndProject
    "q5_nation_volume",   // six-table join tree
    "s3_listing_page",    // cached metadata + top-k, no global sort
    "d4_ngram_jaccard",   // blocked pair join + native intersect
    "sim_topk_cosine",    // broadcast query side + native dot
    "d2_minhash_lsh",     // one-pass native signatures, bucket expansion
    "sim_ivf_topk",       // broadcast centroids/probes, cell-local topk
    "w4_pagination",      // distributed prefix-sum, no 1-partition window
    "t2_quality_score",   // single codegen span of native text scans
    "w6_asof_join",       // union + one partitioned window, single shuffle
    "a8_sessionization",  // stacked per-key windows, one exchange
    "t6_repetition",      // native one-pass counters, zero shuffle
    "d9_decontaminate",   // broadcast eval-shingle join, narrow corpus pass
    "sim_quantized_topk", // int8 quantize + broadcast query side
    "t7_tfidf",           // two partial aggs + broadcast DF join
    "t8_pii_redact",      // pure narrow regex chain, no shuffle
    "t9_source_overlap",  // fp-keyed self-join, bounded group fan-out
    "pipe4_token_shards", // distributed prefix sum, no global window
    "pipe5_quality_cut",  // per-language window, one exchange
    "b1_bucketed_join",   // zero-Exchange SortMergeJoin on buckets
    "sim_funnel_topk",    // broadcast candidate pairs, corpus unshuffled
    "a7_key_count_pages", // distributed numbering, no 1-partition window
    "w8_top_per_group",   // WindowGroupLimit: bounded k-buffer per group
    "t11_unigram_logprob", // broadcast vocab table, one doc-keyed agg
    "d10_semdedup",       // literal-centroid fold: zero-shuffle assignment
    "pipe8_dsir_sample",  // broadcast vocab, TakeOrderedAndProject top-n
    "t12_chunk_scrub",    // min-struct agg, NO window (de-skewed r6)
    "d11_bloom_decontaminate", // bloom subquery probe in the narrow pass
    "t13_dup_spans",      // gram groupBy + AQE-splittable join-back (r6)
    "pipe9_scrub_select_pack", // composed scrub -> DSIR -> shard pack
    "s28_column_mapping", // physical->logical relabel is a pure Project
    "d12_kmeans_cells",   // trained-centroid literal fold, zero shuffle
    "sql_select",         // SQL alias resolves to the SAME pruned scan
    "s30_colmap_id",      // field-id resolution is a pure Project too
    "sql_table_changes",  // CDF reconstruction + broadcast ts join (r9)
    "s34_column_rename",  // mapped WRITE lifecycle readback: relabel
                          // stays a pure Project over the scan (r9)
    "s38_colmap_id_write", // id-mode WRITE lifecycle readback: footer
                          // field-id resolution stays a pure Project
                          // over the scan (r13)
    "s39_cdf_write",      // table_changes over cdc-bearing commits:
                          // the feed is a union of cdc-file scans +
                          // partition-value literals, one agg (r13)
    "s47_generated_prune", // ts-bounded read over a generated-
                          // partitioned table: the DERIVED day bound
                          // reaches the scan as PartitionFilters (r14)
    "s36_identity",       // evolving identity-merge lifecycle readback
    "s40_mapped_cdf",     // evolving mapped-merge lifecycle readback:
                          // relabel stays a pure Project (r16/r17)
    "s46_merge_clauses",  // general MERGE WITH SCHEMA EVOLUTION
                          // lifecycle readback (r16/r17)
    "sql_replace_columns") // REPLACE COLUMNS lifecycle readback: the
                          // post-replace scan reads pre-replace bytes
                          // through stable physicalNames — a pure
                          // Project over the pruned scan (r19)

  /** Prose pin for the r16/r17 schema-evolution WRITE shapes — the
    * parts of the evolving-merge contract a readback explain cannot
    * show. Appended verbatim to PLANS.md on every regeneration. */
  val evolutionAppendix: String =
    """
## Appendix: evolving-merge commit shapes (s36 / s40 / s46)

Claims measured by the r16 writecurve (BASELINE.md "r16 writecurve: the
evolution matrix at scale" — `merge_clauses_evolving` FLAT at
2.13/1.68/2.62 s across 100/1,000/10,000 files, at-or-below the
non-evolving merge beside it) and pinned by MergeEvolutionSpec /
IdentityEvolutionSpec / NestedEvolutionSpec:

- **Evolution is metadata, never a table pass.** An evolving append /
  keyed merge / general `MERGE WITH SCHEMA EVOLUTION` commits exactly
  ONE `metaData` action carrying the evolved schema (identity tables:
  the SAME line also advances the high-water mark; mapped tables: the
  SAME commit's config carries the ratcheted `maxColumnId`, with fresh
  physicalName/ids assigned at every nesting depth since r17). No
  pre-evolution file is read or rewritten for the schema change
  itself.
- **Rewrites stay blast-radius-scoped.** Discovery is key-range-pruned
  (`keyRangeFileCond` over partitionValues + per-file stats); only
  files where a clause actually FIRES rewrite. The evolving leg of the
  writecurve prices at-or-below the non-evolving one because the new
  column rides the already-planned rewrite.
- **Pre-evolution frames widen as a pure Project.** `widenTo` aligns
  rewrite survivors / CDF preimages / clause assignments to the
  evolved type — null-filling new (nested) fields in a projection, no
  shuffle, no extra scan. On mapped tables the physical rename is the
  same Project (`toPhysical` casts to the physical struct shape).
- **Readback plans below** (s36/s40/s46 sections): the post-evolution
  aggregate is one pruned scan + two-phase agg; mapped relabel stays a
  Project over the scan exactly like the non-evolving mapped gates.
"""

  /** Prose pin for the r18 nested-ALTER surface — metadata-only verb
    * shapes a readback explain cannot show. Appended verbatim to
    * PLANS.md on every regeneration. */
  val nestedAlterAppendix: String =
    """
## Appendix: the r18 nested-ALTER surface — every verb is one metadata commit

Claims measured by the r18 writecurve (BASELINE.md "r18 writecurve:
evolving-merge NESTED TYPE WIDENING on a mapped table at scale" —
`merge_widen_mapped` FLAT at 1.62/1.62/1.82 s across 100/1,000/10,000
files) and pinned by NestedAlterSpec / TypeWideningSpec /
MergeEvolutionSpec:

- **The whole ALTER COLUMN verb set is metadata-only.** SET/DROP
  DEFAULT (now on nested struct fields), COMMENT, FIRST/AFTER reorder
  (any struct depth, incl. positioned ADD COLUMNS), DROP NOT NULL,
  TYPE widening (now crossing arrays/maps via Delta's
  `element`/`key`/`value` path segments, with a trailing container run
  widening the element/value type itself under the spec's `fieldPath`
  record) — each commits one `metaData` action. No verb reads or
  rewrites a data file; at 10⁷ files the cost is independent of the
  table.
- **Omission semantics stay projection-shaped.** A nested DEFAULT is
  materialized by `applyDefaults` as a narrow Project over the
  incoming frame (struct rebuild via `withField` / a defaults-struct
  literal) — zero cost when no nested default is declared (one
  driver-side metadata scan decides).
- **Evolving-merge widening fuses the ALTER into the DML commit.**
  `mergeStructTypes(widenLeaves)` composes the clause types for
  STRUCT-bearing columns only (top-level scalars keep cast-at-write —
  silently retyping a plain column would attach the reader-blocking
  typeWidening feature as a side effect), `stampTypeChanges` records
  the spec's `delta.typeChanges`, and the `typeWidening` feature joins
  the protocol in the SAME commit as the key-pinned rewrite — the
  widening itself adds no file I/O, which is what the flat writecurve
  point pins.
- **CDF reads under the declared schema.** `readCdf` scans cdc files
  with an explicit (wide, evolved) schema on BOTH the mapped and
  unmapped branches, so pre-widen cdc files upcast exactly like data
  files and pre-evolution files null-fill — while a cdc action of a
  partitioned table MISSING a partitionValues key refuses loudly
  (silent nulls would be data loss). The whole per-window action
  census is ONE metadata collect (r18: was five).
- **Guards are text-precise, fail-closed.** The constraint/generated
  guards match the full dotted path (each segment optionally
  backticked, whitespace-tolerant dots, `.` as a trailing boundary so
  deeper references block their ancestors) plus whole-ancestor uses;
  unresolvable shapes still refuse conservatively.
"""

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "docs/PLANS.md"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
      // write timestamps as INT64 MICROS (the real-Delta parquet shape;
      // Spark's legacy INT96 default carries NO footer statistics)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# Physical plans (captured by graft.PlanAudit at ")
      .append(sfDir).append(")\n\nEvidence for ARCHITECTURE.md's scale ")
      .append("claims; regenerate with `sbt \"runMain graft.PlanAudit\"`.\n")
    audited.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    sb.append(evolutionAppendix)
    sb.append(nestedAlterAppendix)
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
