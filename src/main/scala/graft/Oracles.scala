package graft

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]].
  *
  * Dialect notes (DuckDB 1.x): regexp_replace needs the 'g' flag to
  * replace all matches (Spark replaces all by default); `/` on integers is
  * float division; count/sum results are cast to BIGINT to match Spark's
  * 64-bit longs; shingle/bit explosion uses `unnest(generate_series(...))`
  * in the select list.
  */
object Oracles {

  /** Shared synthetic file-listing CTE — mirrors
    * [[graft.listing.ObjectListing.filesDF]] exactly. Queries append
    * ", name AS (...)" or a bare SELECT. */
  private val FILES =
    """WITH files0 AS (
  SELECT key, min(size) AS size, min(l_returnflag) AS l_returnflag,
         min(l_linestatus) AS l_linestatus, min(l_shipdate) AS l_shipdate
  FROM (
    SELECT concat('lineitem/l_returnflag=', l_returnflag,
                  '/l_linestatus=', l_linestatus,
                  '/part-', lpad(CAST(l_orderkey AS VARCHAR), 10, '0'), '-',
                  lpad(CAST(l_linenumber AS VARCHAR), 2, '0'),
                  '.parquet') AS key,
           l_orderkey * 131 + l_linenumber * 7 AS size,
           l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
  ) GROUP BY key
), files AS (
  SELECT key, size, md5(key) AS etag, l_shipdate AS last_modified,
         'STANDARD' AS storage_class, l_returnflag, l_linestatus
  FROM files0
)"""

  private val ALLOWED =
    "(l_returnflag = 'R' AND l_linestatus = 'F') OR (l_returnflag = 'N')"
  private val ALLOWED_RF_NO =
    "(l_returnflag = 'R' AND l_linestatus = 'F') OR (l_returnflag = 'N' AND l_linestatus = 'O')"

  val sql: Map[String, String] = Map(

    "s1_list_buckets" ->
      """SELECT 'datalake' AS name, TIMESTAMP '2024-01-01 00:00:00' AS creation_date""",

    "s2_list_tables" ->
      """SELECT alias || '/' AS common_prefix
FROM (VALUES ('region'),('nation'),('customer'),('supplier'),('part'),
             ('orders'),('lineitem'),('events'),('documents'),('embeddings')) t(alias)
ORDER BY common_prefix""",

    "s3_listing_page" -> (FILES +
      """
SELECT key, size, etag, last_modified, storage_class
FROM files
WHERE key LIKE 'lineitem/l_returnflag=N/%'
  AND key > 'lineitem/l_returnflag=N/l_linestatus=O/part-0000010000-01.parquet'
ORDER BY key
LIMIT 100"""),

    "s3_common_prefixes" -> (FILES +
      """
SELECT DISTINCT 'lineitem/' || split_part(substr(key, 10), '/', 1) || '/' AS common_prefix
FROM files
WHERE key LIKE 'lineitem/%' AND strpos(substr(key, 10), '/') > 0
ORDER BY common_prefix"""),

    "s8_head_metadata" -> (FILES +
      """
SELECT key, size, etag, last_modified, storage_class
FROM files ORDER BY key LIMIT 1"""),

    "w4_pagination" -> (FILES +
      """
SELECT key, size, rn FROM (
  SELECT key, size, row_number() OVER (ORDER BY key) AS rn FROM files
) WHERE rn > 200 AND rn <= 300 ORDER BY key"""),

    "s3_list_truncation" -> (FILES +
      """
SELECT CAST(count(*) AS BIGINT) AS key_count,
       count(*) = 100 AS is_truncated,
       max(key) AS next_continuation_token
FROM (
  SELECT key FROM files WHERE key LIKE 'lineitem/l_returnflag=R/%'
  ORDER BY key LIMIT 100
)"""),

    "s7_ranged_read" ->
      """SELECT doc_id,
  (doc_id * 7) % 40 AS range_start,
  doc_id % 20 + 5 AS range_len,
  substr(text, CAST((doc_id * 7) % 40 + 1 AS INT), CAST(doc_id % 20 + 5 AS INT)) AS chunk
FROM documents ORDER BY doc_id""",

    "s6_get_mode" -> (FILES +
      """
SELECT get_mode, ranged, proxy_partial, action, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT CASE WHEN size % 2 = 0 THEN 'proxy' ELSE 'presignedUrl' END AS get_mode,
         size % 3 = 0 AS ranged,
         size % 5 = 0 AS proxy_partial,
         CASE WHEN size % 2 = 0 THEN 'STREAM_PROXY'
              WHEN size % 3 = 0 AND size % 5 = 0 THEN 'STREAM_PROXY_RANGE'
              WHEN size % 3 = 0 THEN 'REDIRECT_PRESIGNED_RANGE'
              ELSE 'REDIRECT_PRESIGNED' END AS action
  FROM files
) GROUP BY get_mode, ranged, proxy_partial, action
ORDER BY get_mode, ranged, proxy_partial"""),

    "p8_routing" -> (FILES +
      """
SELECT path,
  split_part(path, '/', 1) AS alias,
  substr(path, strpos(path, '/') + 1) AS rest,
  CASE WHEN path LIKE '%/' THEN 'LIST'
       WHEN substr(path, strpos(path, '/') + 1) LIKE '_delta_log/%'
         THEN 'LOG_PASSTHROUGH'
       ELSE 'DATA_GET' END AS route
FROM (
  SELECT key AS path FROM (SELECT key FROM files ORDER BY key LIMIT 50)
  UNION ALL SELECT 'lineitem/'
  UNION ALL SELECT 'lineitem/_delta_log/00000000000000000000.json'
) ORDER BY path"""),

    "p3_acl_allow" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE $ALLOWED_RF_NO
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "p4_acl_allowed_files" -> (FILES +
      s"""
SELECT key FROM files WHERE $ALLOWED ORDER BY key LIMIT 200"""),

    "p6_acl_denied" -> (FILES +
      s"""
SELECT key FROM files
WHERE size % 97 = 0
  AND key NOT IN (SELECT key FROM files WHERE $ALLOWED)
ORDER BY key"""),

    "p7_acl_empty_bypass" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem""",

    "j1_catalog_join" ->
      """SELECT r.alias, c.file_name, c.alias IS NOT NULL AS found
FROM (VALUES ('lineitem'),('orders'),('no_such_table'),('events')) r(alias)
LEFT JOIN (VALUES ('region','region.parquet'),('nation','nation.parquet'),
  ('customer','customer.parquet'),('supplier','supplier.parquet'),
  ('part','part.parquet'),('orders','orders.parquet'),
  ('lineitem','lineitem.parquet'),('events','events.parquet'),
  ('documents','documents.parquet'),('embeddings','embeddings.parquet'))
  c(alias, file_name)
ON r.alias = c.alias
ORDER BY r.alias""",

    "j2_allowed_semi" -> (FILES +
      s"""
SELECT key FROM files
WHERE size % 53 = 0
  AND key IN (SELECT key FROM files WHERE $ALLOWED)
ORDER BY key"""),

    "j3_perm_lookup" ->
      """SELECT r.user_id, r.table_name, e.perm_id, e.n_filters
FROM (VALUES ('alice','lineitem'),('alice','orders'),
             ('bob','lineitem'),('carol','lineitem')) r(user_id, table_name)
LEFT JOIN (VALUES ('alice','lineitem',CAST(1 AS BIGINT),CAST(1 AS BIGINT)),
                  ('alice','orders',CAST(2 AS BIGINT),CAST(2 AS BIGINT)),
                  ('bob','lineitem',CAST(3 AS BIGINT),CAST(1 AS BIGINT)),
                  ('bob','part',CAST(4 AS BIGINT),CAST(0 AS BIGINT)))
  e(user_id, table_name, perm_id, n_filters)
ON r.user_id = e.user_id AND r.table_name = e.table_name
ORDER BY r.user_id, r.table_name""",

    "j4_perm_merge" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE $ALLOWED
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    // same effective filter set as j4 — static (R ∧ F) ∪ the DB grant
    // ({l_returnflag: N} for alice/lineitem), resolved through Derby
    // the CDF of (update price=0 where qty=1) then (delete qty=2 ∧
    // orderkey%3=0) over the qty<=2 slice: preimages = the changed rows
    // with ORIGINAL prices, postimages = the same rows at price 0,
    // deletes = the post-update state of the deleted rows (qty=2 rows
    // were untouched by the update, so their prices are original)
    "s20_cdf" ->
      """WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
  FROM lineitem WHERE l_quantity <= 2),
upd AS (SELECT * FROM src WHERE l_quantity = 1 AND l_extendedprice <> 0),
del AS (SELECT * FROM src WHERE l_quantity = 2 AND l_orderkey % 3 = 0)
SELECT * FROM (
  SELECT 'delete' AS change_type, CAST(count(*) AS BIGINT) AS n_rows,
         sum(round(l_extendedprice*100))/100.0 AS sum_price,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty FROM del
  UNION ALL
  SELECT 'update_preimage', CAST(count(*) AS BIGINT),
         sum(round(l_extendedprice*100))/100.0,
         CAST(sum(l_quantity) AS BIGINT) FROM upd
  UNION ALL
  SELECT 'update_postimage', CAST(count(*) AS BIGINT),
         0.0, CAST(sum(l_quantity) AS BIGINT) FROM upd
) ORDER BY change_type""",

    "s31_stream_sink" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s29_stream_cdf" ->
      """WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
  FROM lineitem WHERE l_quantity <= 2),
upd AS (SELECT * FROM src WHERE l_quantity = 1 AND l_extendedprice <> 0),
del AS (SELECT * FROM src WHERE l_quantity = 2 AND l_orderkey % 3 = 0)
SELECT * FROM (
  SELECT 'delete' AS change_type, CAST(count(*) AS BIGINT) AS n_rows,
         sum(round(l_extendedprice*100))/100.0 AS sum_price,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty FROM del
  UNION ALL
  SELECT 'insert', CAST(count(*) AS BIGINT),
         sum(round(l_extendedprice*100))/100.0,
         CAST(sum(l_quantity) AS BIGINT) FROM src
  UNION ALL
  SELECT 'update_preimage', CAST(count(*) AS BIGINT),
         sum(round(l_extendedprice*100))/100.0,
         CAST(sum(l_quantity) AS BIGINT) FROM upd
  UNION ALL
  SELECT 'update_postimage', CAST(count(*) AS BIGINT),
         0.0, CAST(sum(l_quantity) AS BIGINT) FROM upd
) ORDER BY change_type""",

    "j5_db_permissions" ->
      s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE $ALLOWED
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "u1_union_distinct" -> (FILES +
      s"""
SELECT CAST(count(*) AS BIGINT) AS n_files, CAST(sum(size) AS BIGINT) AS total_size
FROM (
  SELECT DISTINCT key, size FROM (
    SELECT key, size FROM files WHERE l_returnflag = 'N'
    UNION ALL
    SELECT key, size FROM files WHERE $ALLOWED_RF_NO
  )
)"""),

    "f1_xml_escape" ->
      """SELECT doc_id,
  replace(replace(replace(replace(replace(
    '<doc id="' || CAST(doc_id AS VARCHAR) || '">&''' || substr(text, 1, 20) || '''</doc>',
    '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&apos;') AS escaped
FROM documents ORDER BY doc_id LIMIT 50""",

    "f2_extract_aws_user" ->
      """SELECT DISTINCT regexp_extract(
  'AWS4-HMAC-SHA256 Credential=AKIA' || lpad(CAST(user_id AS VARCHAR), 6, '0')
    || '/20240101/us-east-1/s3/aws4_request',
  'Credential=([^/]+)/', 1) AS access_key
FROM events ORDER BY access_key""",

    "f3_s3_uri_parse" ->
      """SELECT uri,
  regexp_extract(uri, '^s3://([^/]+)', 1) AS bucket,
  regexp_replace(regexp_extract(uri, '^s3://[^/]+/(.*)$', 1), '/+$', '') AS prefix
FROM (
  SELECT 's3://bucket-' || CAST(n_regionkey AS VARCHAR) || '/data/' || lower(n_name) || '/' AS uri
  FROM nation
) ORDER BY uri""",

    "f5_key_rewrite" -> (FILES +
      """
SELECT 'trades/' || key AS logical_key,
       'warehouse/abc123/' || key AS physical_key
FROM (SELECT key FROM files ORDER BY key LIMIT 100)
ORDER BY logical_key"""),

    "f6_query_decode" ->
      """SELECT DISTINCT qs,
  nullif(regexp_extract(qs, 'prefix=([^&]*)', 1), '') AS prefix_param,
  CAST(try_cast(nullif(regexp_extract(qs, 'max-keys=([^&]*)', 1), '') AS INT) AS BIGINT) AS max_keys
FROM (
  SELECT 'list-type=2&prefix=' || l_returnflag || '/f&max-keys=' || CAST(l_linenumber AS VARCHAR) AS qs
  FROM lineitem
) ORDER BY qs""",

    "f8_timestamp_format" ->
      """SELECT o_orderdate,
  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '.000Z' AS s3_ts,
  strftime(o_orderdate, '%a, %d %b %Y %H:%M:%S') || ' GMT' AS http_date
FROM (SELECT DISTINCT o_orderdate FROM orders)
ORDER BY o_orderdate LIMIT 100""",

    "f10_presign_detect" -> (FILES +
      """
SELECT presigned, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT (url LIKE '%Signature=%' OR url LIKE '%X-Amz-Signature=%') AS presigned
  FROM (
    SELECT 'https://s3.example/' || key ||
      CASE WHEN size % 2 = 0 THEN '?X-Amz-Signature=abc' ELSE '' END AS url
    FROM files
  )
) GROUP BY presigned ORDER BY presigned"""),

    "f12_xml_render" -> (FILES +
      """
SELECT key,
  '<Contents><Key>' ||
  replace(replace(replace(replace(replace(key,
    '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&apos;')
  || '</Key><Size>' || CAST(size AS VARCHAR)
  || '</Size><ETag>&quot;' || etag
  || '&quot;</ETag><StorageClass>' || storage_class
  || '</StorageClass></Contents>' AS xml
FROM (SELECT * FROM files ORDER BY key LIMIT 100)
ORDER BY key"""),

    "f13_f14_keys_ranges" ->
      """SELECT DISTINCT
  'u' || CAST(user_id AS VARCHAR) || ':' || event_type AS cache_key,
  'bytes=' || CAST(event_id % 1000 AS VARCHAR) || '-' || CAST(event_id % 1000 + 99 AS VARCHAR) AS range_header,
  CAST(event_id % 1000 AS BIGINT) AS range_start,
  CAST(event_id % 1000 + 99 AS BIGINT) AS range_end,
  CAST(100 AS BIGINT) AS range_len
FROM events ORDER BY cache_key, range_header LIMIT 500""",

    "a1_request_counters" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type""",

    "a10_rollup" ->
      """SELECT event_type, user_id % 10 AS user_bucket,
  CAST(count(*) AS BIGINT) AS n,
  sum(round(value * 100)) / 100.0 AS sum_value
FROM events
GROUP BY ROLLUP (event_type, user_bucket)
ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""",

    "a11_cube" ->
      """SELECT event_type, user_id % 10 AS user_bucket,
  CAST(count(*) AS BIGINT) AS n,
  sum(round(value * 100)) / 100.0 AS sum_value
FROM events
GROUP BY CUBE (event_type, user_bucket)
ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""",

    "a12_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY 1""",

    "a13_unpivot" ->
      """WITH p AS (
  SELECT user_id % 10 AS ub, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), g AS (SELECT DISTINCT user_id % 10 AS ub FROM events),
t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type)
SELECT g.ub AS user_bucket, t.event_type,
  CAST(coalesce(p.n, 0) AS BIGINT) AS n
FROM g CROSS JOIN t LEFT JOIN p ON p.ub = g.ub AND p.event_type = t.event_type
ORDER BY 1, 2""",

    "a9_latency_quantiles" ->
      """SELECT event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.9), 4) AS p90,
  round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type""",

    "a8_sessionization" ->
      """WITH t AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
  FROM events
), flagged AS (
  SELECT user_id, event_id, tus,
    CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
              IS NULL
           OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
              > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM t
), sessions AS (
  SELECT user_id, event_id,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(n_events) AS BIGINT) AS n_events,
  CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id""",

    "pipe3_mix_dedup_stats" ->
      """WITH mixed AS (
  SELECT * FROM documents
  WHERE ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100
    < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 100 WHEN 'es' THEN 100
        WHEN 'fr' THEN 100 WHEN 'zh' THEN 50 ELSE 0 END
), keep AS (
  SELECT min(doc_id) AS doc_id FROM mixed
  GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
), q AS (
  SELECT doc_id,
    CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)
      + CAST(length(list_filter(string_split(text, ' '),
          t -> t IN ('the','a','of','and','to','in','is','der','die','das','und','ist','ein','zu','el','la','de','y','es','un','en','le','et','les','est','dans','的','是','了','在','和','有','我'))) AS DOUBLE)
        / length(list_filter(string_split(text, ' '), t -> t <> ''))
      - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
      AS quality_score
  FROM mixed
)
SELECT m.lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens_total,
  round(sum(q.quality_score) / count(*), 4) AS avg_quality
FROM mixed m JOIN keep k ON m.doc_id = k.doc_id
JOIN q ON q.doc_id = m.doc_id
GROUP BY m.lang ORDER BY m.lang""",

    "pipe6_temperature_mix" ->
      """WITH c AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY source
), w AS (
  SELECT source,
    least(100, greatest(1,
      CAST(round((1.0 / sqrt(n)) * (50.0 / (SELECT min(1.0 / sqrt(n)) FROM c))) AS INT))) AS pct
  FROM c
), b AS (
  SELECT doc_id, source,
    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100
      AS bucket
  FROM documents
)
SELECT b.source, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(min(doc_id) AS BIGINT) AS first_kept
FROM b JOIN w ON b.source = w.source
WHERE bucket < pct
GROUP BY b.source ORDER BY b.source""",

    "pipe7_stratified_sample" ->
      """SELECT source, doc_id FROM (
  SELECT source, doc_id,
    row_number() OVER (PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 10 ORDER BY source, doc_id""",

    "t10_edit_distance" ->
      """WITH p AS (
  SELECT doc_id,
    substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 30) AS pf
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(levenshtein(a.pf, b.pf) AS BIGINT) AS dist
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE levenshtein(a.pf, b.pf) <= 5
ORDER BY 1, 2""",

    "pipe2_weighted_mix" ->
      """WITH b AS (
  SELECT doc_id, lang,
    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100
      AS bucket
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(min(doc_id) AS BIGINT) AS first_kept
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 100
  WHEN 'es' THEN 100 WHEN 'fr' THEN 100 WHEN 'zh' THEN 25 ELSE 0 END
GROUP BY lang ORDER BY lang""",

    "t5_vocab_topk" ->
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_total
FROM (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents)
GROUP BY token
ORDER BY n_docs DESC, n_total DESC, token ASC
LIMIT 50""",

    "t7_tfidf" ->
      """WITH tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        FROM documents)
  GROUP BY doc_id, token
), dfx AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (
  SELECT doc_id, token, tf, df,
    CAST(tf * (n + 1) AS DOUBLE) / (df + 1) AS tfidf
  FROM tf JOIN dfx USING (token), nn
)
SELECT doc_id, token, tf, df, tfidf, rn AS rk FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rn
  FROM s
) WHERE rn <= 3 ORDER BY doc_id, rk""",

    "t6_repetition" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks)
  GROUP BY doc_id, w
), wagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
    CAST(count(*) AS BIGINT) AS n_distinct_words,
    CAST(max(c) AS BIGINT) AS max_word_count
  FROM wc GROUP BY doc_id
), bc AS (
  SELECT doc_id, b, count(*) AS c
  FROM (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS b
        FROM (SELECT doc_id, tk,
                unnest(generate_series(1, len(tk) - 1)) AS i
              FROM toks WHERE len(tk) >= 2))
  GROUP BY doc_id, b
), bagg AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bigram_count
  FROM bc GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(n_words, 0) AS n_words,
  coalesce(n_distinct_words, 0) AS n_distinct_words,
  coalesce(max_word_count, 0) AS max_word_count,
  coalesce(max_bigram_count, 0) AS max_bigram_count,
  CASE WHEN coalesce(n_words, 0) = 0 THEN 0.0
    ELSE CAST(n_words - n_distinct_words AS DOUBLE) / n_words END
    AS dup_word_ratio,
  CASE WHEN coalesce(n_words, 0) = 0 THEN 0.0
    ELSE CAST(max_word_count AS DOUBLE) / n_words END AS top_word_ratio,
  CASE WHEN coalesce(n_words, 0) <= 1 THEN 0.0
    ELSE CAST(coalesce(max_bigram_count, 0) AS DOUBLE) / (n_words - 1) END
    AS top_bigram_ratio
FROM documents d
LEFT JOIN wagg USING (doc_id)
LEFT JOIN bagg USING (doc_id)
ORDER BY doc_id""",

    "d11_bloom_decontaminate" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(tk[i:i+3], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) AS i
        FROM toks WHERE len(tk) >= 4)
), ev AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 89 = 0
)
SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared
FROM grams JOIN ev USING (g)
WHERE doc_id % 89 <> 0
GROUP BY doc_id ORDER BY doc_id""",

    "s23_history" ->
      """SELECT CAST(v AS BIGINT) AS version, op AS operation
FROM (VALUES (4, 'RESTORE'), (3, 'OPTIMIZE'), (2, 'DELETE'),
             (1, 'WRITE'), (0, 'WRITE')) t(v, op)
ORDER BY version DESC""",

    "d9_decontaminate" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(tk[i:i+3], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 3)) AS i
        FROM toks WHERE len(tk) >= 4)
), ev AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
)
SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared
FROM grams JOIN ev USING (g)
WHERE doc_id % 97 <> 0
GROUP BY doc_id ORDER BY doc_id""",

    "w6_asof_join" ->
      """WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1 AS side, value,
         NULL::DOUBLE AS view_value, NULL::TIMESTAMP AS view_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 0, NULL,
         value, CAST(ts AS TIMESTAMP)
  FROM events WHERE event_type = 'view'
), w AS (
  SELECT user_id, ts, event_id, side, value,
    last_value(view_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_value,
    last_value(view_ts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_ts
  FROM u
)
SELECT user_id, event_id, ts, value, asof_view_value, asof_view_ts
FROM w WHERE side = 1 ORDER BY user_id, event_id""",

    "w7_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) AS gap_us
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)))
       <= 60 * 1000 * 1000
ORDER BY p.user_id, purchase_id, view_id""",

    "a2_distinct_users_minute" ->
      """SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
  CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events GROUP BY window_start ORDER BY window_start""",

    "a3_avg_latency_minute" ->
      """SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
  sum(round(value * 100)) / 100.0 / count(*) AS avg_latency
FROM events GROUP BY window_start ORDER BY window_start""",

    "a4_avg_size_minute" ->
      """SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
  CAST(sum(event_id % 4096 + 128) AS DOUBLE) / count(*) AS avg_size_bytes
FROM events GROUP BY window_start ORDER BY window_start""",

    "a7_key_count_pages" -> (FILES +
      """
SELECT page, CAST(count(*) AS BIGINT) AS key_count FROM (
  SELECT CAST((rn - 1) // 1000 + 1 AS BIGINT) AS page FROM (
    SELECT row_number() OVER (ORDER BY key) AS rn FROM files
  )
) GROUP BY page ORDER BY page"""),

    "a5_metrics_minute" ->
      """SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS window_start,
  CAST(count(*) AS BIGINT) AS queries_served,
  CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
  sum(round(value * 100)) / 100.0 / count(*) AS avg_latency,
  CAST(sum(event_id % 4096 + 128) AS DOUBLE) / count(*) AS avg_size_bytes
FROM events GROUP BY window_start ORDER BY window_start""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_base_price,
  sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS sum_disc_price,
  sum(l_quantity) / count(*) AS avg_qty,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q5_nation_volume" ->
      """SELECT n_name,
  sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "w5_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
  sum(round(o_totalprice * 100)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
    AS running_total,
  CAST(row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
    AS order_seq
FROM orders WHERE o_custkey < 200
ORDER BY o_custkey, o_orderkey""",

    "w8_top_per_group" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, rk FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
    CAST(row_number() OVER (
      PARTITION BY o_orderstatus
      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders)
WHERE rk <= 3 ORDER BY o_orderstatus, rk""",

    // ln association-order / last-ulp differences are ~1e-13 relative;
    // round(,4) on the OUTPUT absorbs them (oracle exactness rules)
    "t11_unigram_logprob" ->
      """WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
), tf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY token
), tot AS (SELECT CAST(sum(tf) AS BIGINT) AS corpus_tokens FROM tf)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  round(ln(corpus_tokens) - avg(ln(tf)), 4) AS avg_logprob
FROM toks JOIN tf USING (token), tot
GROUP BY doc_id, corpus_tokens
ORDER BY doc_id""",

    "q6_part_stats" ->
      """SELECT p_brand,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(count(DISTINCT p_type) AS BIGINT) AS n_types,
  sum(round(p_retailprice * 100)) / 100.0 AS total_retail,
  CAST(min(p_size) AS BIGINT) AS min_size,
  CAST(max(p_size) AS BIGINT) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand""",

    "q3_top_revenue" ->
      """SELECT o_orderkey,
  sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "d1_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
  CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY content_hash ORDER BY keeper_doc_id""",

    "pipe8_dsir_sample" ->
      """WITH toks AS (
  SELECT doc_id, source = 'src0' AS is_target,
    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
), tft AS (
  SELECT token, count(*) AS tf_t FROM toks WHERE is_target GROUP BY token
), tfr AS (
  SELECT token, count(*) AS tf_r FROM toks WHERE NOT is_target GROUP BY token
), vocab AS (
  SELECT token, coalesce(tf_t, 0) AS tf_t, coalesce(tf_r, 0) AS tf_r
  FROM tft FULL JOIN tfr USING (token)
), tot AS (
  SELECT sum(tf_t) AS tt, sum(tf_r) AS tr, count(*) AS v FROM vocab
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  round(avg(ln(CAST(tf_t AS DOUBLE) + 1) - ln(CAST(tf_r AS DOUBLE) + 1)) +
    ln(CAST(tr + v AS DOUBLE)) - ln(CAST(tt + v AS DOUBLE)), 4) AS logratio
FROM toks JOIN vocab USING (token), tot
WHERE NOT is_target
GROUP BY doc_id, tt, tr, v
ORDER BY logratio DESC, doc_id LIMIT 50""",

    "pipe9_scrub_select_pack" ->
      """WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(tk[i:i+4], ' ') AS gram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
        FROM toks WHERE len(tk) >= 5)
), flagged AS (
  SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) > 1 AS dup FROM grams
), spans AS (
  SELECT f.doc_id,
    coalesce(max(r.run) + 4, 0) AS max_span
  FROM flagged f LEFT JOIN (
    SELECT doc_id, isl, count(*) AS run FROM (
      SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged WHERE dup)
    GROUP BY doc_id, isl) r ON f.doc_id = r.doc_id
  GROUP BY f.doc_id
), clean AS (
  SELECT t.doc_id, t.source, t.tk
  FROM toks t JOIN spans s ON t.doc_id = s.doc_id
  WHERE s.max_span < 12
), ctoks AS (
  SELECT doc_id, source = 'src0' AS is_target, unnest(tk) AS token FROM clean
), tft AS (
  SELECT token, count(*) AS tf_t FROM ctoks WHERE is_target GROUP BY token
), tfr AS (
  SELECT token, count(*) AS tf_r FROM ctoks WHERE NOT is_target GROUP BY token
), vocab AS (
  SELECT token, coalesce(tf_t, 0) AS tf_t, coalesce(tf_r, 0) AS tf_r
  FROM tft FULL JOIN tfr USING (token)
), tot AS (
  SELECT sum(tf_t) AS tt, sum(tf_r) AS tr, count(*) AS v FROM vocab
), scored AS (
  SELECT doc_id,
    round(avg(ln(CAST(tf_t AS DOUBLE) + 1) - ln(CAST(tf_r AS DOUBLE) + 1)) +
      ln(CAST(tr + v AS DOUBLE)) - ln(CAST(tt + v AS DOUBLE)), 4) AS logratio
  FROM ctoks JOIN vocab USING (token), tot
  WHERE NOT is_target
  GROUP BY doc_id, tt, tr, v
), selected AS (
  SELECT doc_id FROM scored ORDER BY logratio DESC, doc_id LIMIT 100
), packed AS (
  SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
    coalesce(sum(CAST(len(t.tk) AS BIGINT)) OVER (ORDER BY t.doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM toks t JOIN selected USING (doc_id)
)
SELECT CAST(floor(cumb / 2000) AS BIGINT) AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM packed GROUP BY 1 ORDER BY 1""",

    "t13_dup_spans" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(tk[i:i+4], ' ') AS gram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
        FROM toks WHERE len(tk) >= 5)
), freq AS (
  SELECT gram, count(*) AS n_occ FROM grams GROUP BY gram
), flagged AS (
  SELECT doc_id, pos, n_occ > 1 AS dup FROM grams JOIN freq USING (gram)
), runs AS (
  SELECT doc_id, max(run) AS max_run FROM (
    SELECT doc_id, isl, count(*) AS run FROM (
      SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged WHERE dup)
    GROUP BY doc_id, isl)
  GROUP BY doc_id
)
SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
  CAST(coalesce(any_value(r.max_run) + 4, 0) AS BIGINT) AS max_dup_span_words
FROM flagged f LEFT JOIN runs r ON f.doc_id = r.doc_id
GROUP BY f.doc_id ORDER BY f.doc_id""",

    "t12_chunk_scrub" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), chunks AS (
  SELECT doc_id, i AS pos,
    array_to_string(list_slice(tk, i*10+1, i*10+10), ' ') AS chunk
  FROM (SELECT doc_id, tk,
          unnest(generate_series(0,
            CAST(greatest(ceil(len(tk)/10.0), 1) AS BIGINT) - 1)) AS i
        FROM toks)
), kept AS (
  SELECT doc_id, pos, chunk FROM (
    SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS occ
    FROM chunks) WHERE occ = 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(length(string_agg(chunk, ' ' ORDER BY pos)) AS BIGINT) AS scrub_len,
  md5(string_agg(chunk, ' ' ORDER BY pos)) AS scrub_md5
FROM kept GROUP BY doc_id ORDER BY doc_id""",

    "d6_chunk_dedup" ->
      """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
), chunks AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(tk, i*10+1, i*10+10), ' ')) AS chunk_hash
  FROM (SELECT doc_id, tk,
          unnest(generate_series(0,
            CAST(greatest(ceil(len(tk)/10.0), 1) AS BIGINT) - 1)) AS i
        FROM toks)
), freq AS (
  SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY chunk_hash
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
  CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio
FROM chunks c JOIN freq f USING (chunk_hash)
GROUP BY c.doc_id ORDER BY c.doc_id""",

    "d2_minhash_lsh" ->
      """WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 10) AS shingle
  FROM (SELECT doc_id, text,
          unnest(generate_series(1, greatest(length(text) - 9, 1), 2)) AS i
        FROM documents)
), hh AS (
  SELECT doc_id, md5('a:' || shingle) AS ha, md5('b:' || shingle) AS hb
  FROM sh
), sig AS (
  SELECT doc_id,
    min(substr(ha, 1, 5)) AS h0, min(substr(ha, 6, 5)) AS h1,
    min(substr(ha, 11, 5)) AS h2, min(substr(ha, 16, 5)) AS h3,
    min(substr(ha, 21, 5)) AS h4, min(substr(ha, 26, 5)) AS h5,
    min(substr(hb, 1, 5)) AS h6, min(substr(hb, 6, 5)) AS h7,
    min(substr(hb, 11, 5)) AS h8, min(substr(hb, 16, 5)) AS h9,
    min(substr(hb, 21, 5)) AS h10, min(substr(hb, 26, 5)) AS h11
  FROM hh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2) AS band_hash FROM sig
  UNION ALL SELECT doc_id, 1, md5(h3 || h4 || h5) FROM sig
  UNION ALL SELECT doc_id, 2, md5(h6 || h7 || h8) FROM sig
  UNION ALL SELECT doc_id, 3, md5(h9 || h10 || h11) FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b""",

    "d7_neardup_clusters" ->
      """WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 10) AS shingle
  FROM (SELECT doc_id, text,
          unnest(generate_series(1, greatest(length(text) - 9, 1), 2)) AS i
        FROM documents)
), hh AS (
  SELECT doc_id, md5('a:' || shingle) AS ha, md5('b:' || shingle) AS hb
  FROM sh
), sig AS (
  SELECT doc_id,
    min(substr(ha, 1, 5)) AS h0, min(substr(ha, 6, 5)) AS h1,
    min(substr(ha, 11, 5)) AS h2, min(substr(ha, 16, 5)) AS h3,
    min(substr(ha, 21, 5)) AS h4, min(substr(ha, 26, 5)) AS h5,
    min(substr(hb, 1, 5)) AS h6, min(substr(hb, 6, 5)) AS h7,
    min(substr(hb, 11, 5)) AS h8, min(substr(hb, 16, 5)) AS h9,
    min(substr(hb, 21, 5)) AS h10, min(substr(hb, 26, 5)) AS h11
  FROM hh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2) AS band_hash FROM sig
  UNION ALL SELECT doc_id, 1, md5(h3 || h4 || h5) FROM sig
  UNION ALL SELECT doc_id, 2, md5(h6 || h7 || h8) FROM sig
  UNION ALL SELECT doc_id, 3, md5(h9 || h10 || h11) FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), ed AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS node FROM ed
), reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT e.b AS node, reach.r FROM reach JOIN ed e ON e.a = reach.node
)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id""",

    "d8_minhash_estimate" ->
      """WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 10) AS shingle
  FROM (SELECT doc_id, text,
          unnest(generate_series(1, greatest(length(text) - 9, 1), 2)) AS i
        FROM documents)
), hh AS (
  SELECT doc_id, md5('a:' || shingle) AS ha, md5('b:' || shingle) AS hb
  FROM sh
), sig AS (
  SELECT doc_id,
    min(substr(ha, 1, 5)) AS h0, min(substr(ha, 6, 5)) AS h1,
    min(substr(ha, 11, 5)) AS h2, min(substr(ha, 16, 5)) AS h3,
    min(substr(ha, 21, 5)) AS h4, min(substr(ha, 26, 5)) AS h5,
    min(substr(hb, 1, 5)) AS h6, min(substr(hb, 6, 5)) AS h7,
    min(substr(hb, 11, 5)) AS h8, min(substr(hb, 16, 5)) AS h9,
    min(substr(hb, 21, 5)) AS h10, min(substr(hb, 26, 5)) AS h11
  FROM hh GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, md5(h0 || h1 || h2) AS band_hash FROM sig
  UNION ALL SELECT doc_id, 1, md5(h3 || h4 || h5) FROM sig
  UNION ALL SELECT doc_id, 2, md5(h6 || h7 || h8) FROM sig
  UNION ALL SELECT doc_id, 3, md5(h9 || h10 || h11) FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
  CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h9 = b.h9 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h10 = b.h10 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h11 = b.h11 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
  CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h8 = b.h8 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h9 = b.h9 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h10 = b.h10 THEN 1 ELSE 0 END)
     + (CASE WHEN a.h11 = b.h11 THEN 1 ELSE 0 END) AS DOUBLE) / 12
    AS est_jaccard
FROM pairs p
JOIN sig a ON a.doc_id = p.doc_a
JOIN sig b ON b.doc_id = p.doc_b
ORDER BY doc_a, doc_b""",

    "d3_simhash" ->
      """WITH toks AS (
  SELECT doc_id, md5(unnest(list_filter(string_split(text, ' '), t -> t <> ''))) AS hhex
  FROM documents
), bits AS (
  SELECT doc_id, j,
    strpos('0123456789abcdef', substr(hhex, 1 + j // 4, 1)) - 1 AS nib
  FROM (SELECT doc_id, hhex, unnest(generate_series(0, 31)) AS j FROM toks)
), votes AS (
  SELECT doc_id, j, sum(2 * ((nib >> (j % 4)) & 1) - 1) AS vote
  FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
  CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id""",

    "d4_ngram_jaccard" ->
      """WITH sh AS (
  SELECT DISTINCT doc_id, lang, source,
    CAST(ascii(substr(text, i, 1)) AS BIGINT) * 4398046511104
      + CAST(ascii(substr(text, i + 1, 1)) AS BIGINT) * 2097152
      + CAST(ascii(substr(text, i + 2, 1)) AS BIGINT) AS shingle
  FROM (SELECT doc_id, lang, source, text,
          unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
        FROM documents)
), lists AS (
  SELECT doc_id, lang, source, list(shingle) AS sharr,
         CAST(count(*) AS BIGINT) AS n_sh
  FROM sh GROUP BY doc_id, lang, source
)
SELECT doc_a, doc_b, inter, un, CAST(inter AS DOUBLE) / un AS jaccard
FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(len(list_intersect(a.sharr, b.sharr)) AS BIGINT) AS inter,
    a.n_sh + b.n_sh - CAST(len(list_intersect(a.sharr, b.sharr)) AS BIGINT) AS un
  FROM lists a JOIN lists b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
)
WHERE inter * 2 >= un
ORDER BY doc_a, doc_b""",

    "d5_embedding_neardup" ->
      """WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
), c AS (
  SELECT vec_a, vec_b,
    round(SUM(CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))) *
       sqrt(SUM(CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))), 4) AS cos_sim
  FROM p, (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, cos_sim FROM c
WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b""",

    "sim_lsh_buckets" ->
      """WITH pi AS (
  SELECT unnest(generate_series(0, 7)) AS p
), di AS (
  SELECT unnest(generate_series(0, 63)) AS i
), w AS (
  SELECT p, i,
    ((CAST(i AS BIGINT) * 2654435761 + CAST(p AS BIGINT) * 40503) % 65536)
      - 32768 AS wt
  FROM pi, di
), proj AS (
  SELECT e.vec_id, w.p,
    SUM(CAST(e.embedding[w.i + 1] AS DOUBLE) * CAST(w.wt AS DOUBLE)) AS pr
  FROM embeddings e, w
  GROUP BY e.vec_id, w.p
)
SELECT vec_id,
  CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
FROM proj GROUP BY vec_id ORDER BY vec_id""",

    "sim_lsh_neardup" ->
      """WITH pi AS (
  SELECT unnest(generate_series(0, 7)) AS p
), di AS (
  SELECT unnest(generate_series(0, 63)) AS i
), w AS (
  SELECT p, i,
    ((CAST(i AS BIGINT) * 2654435761 + CAST(p AS BIGINT) * 40503) % 65536)
      - 32768 AS wt
  FROM pi, di
), proj AS (
  SELECT e.vec_id, w.p,
    SUM(CAST(e.embedding[w.i + 1] AS DOUBLE) * CAST(w.wt AS DOUBLE)) AS pr
  FROM embeddings e, w
  GROUP BY e.vec_id, w.p
), buckets AS (
  SELECT vec_id,
    CAST(sum(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
), c AS (
  SELECT p2.vec_a, p2.vec_b,
    round(SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))) *
       sqrt(SUM(CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))), 4) AS cos_sim
  FROM pairs p2
  JOIN embeddings ea ON ea.vec_id = p2.vec_a
  JOIN embeddings eb ON eb.vec_id = p2.vec_b,
  (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY p2.vec_a, p2.vec_b
)
SELECT vec_a, vec_b, cos_sim FROM c
WHERE cos_sim >= 0.2 ORDER BY vec_a, vec_b""",

    "sim_topk_cosine" ->
      """WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0
), s AS (
  SELECT query_id, e.vec_id AS cand_id,
    round(SUM(CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) *
       sqrt(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))), 4) AS cos_sim
  FROM q, embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) g
  WHERE e.vec_id <> query_id
  GROUP BY query_id, cand_id
)
SELECT query_id, cand_id, cos_sim, rn AS rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rn
  FROM s
) WHERE rn <= 10 ORDER BY query_id, rk""",

    "sim_quantized_topk" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
ma AS (
  SELECT vec_id, greatest(max(abs(CAST(embedding[i] AS DOUBLE))), 1e-30) AS m
  FROM embeddings, g GROUP BY vec_id
), qv AS (
  SELECT e.vec_id, i,
    floor(CAST(e.embedding[i] AS DOUBLE) * 127.0 / ma.m + 0.5) AS q
  FROM embeddings e JOIN ma USING (vec_id), g
), s AS (
  SELECT a.vec_id AS query_id, c.vec_id AS cand_id,
    CAST(SUM(a.q * c.q) AS BIGINT) AS qdot
  FROM qv a JOIN qv c ON a.i = c.i AND c.vec_id <> a.vec_id
  WHERE a.vec_id % 100 = 0
  GROUP BY a.vec_id, c.vec_id
)
SELECT query_id, cand_id, qdot, rn AS rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id) AS BIGINT) AS rn
  FROM s
) WHERE rn <= 10 ORDER BY query_id, rk""",

    "sim_funnel_topk" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
ma AS (
  SELECT vec_id, greatest(max(abs(CAST(embedding[i] AS DOUBLE))), 1e-30) AS m
  FROM embeddings, g GROUP BY vec_id
), qv AS (
  SELECT e.vec_id, i,
    floor(CAST(e.embedding[i] AS DOUBLE) * 127.0 / ma.m + 0.5) AS q
  FROM embeddings e JOIN ma USING (vec_id), g
), s AS (
  SELECT a.vec_id AS query_id, c.vec_id AS cand_id,
    CAST(SUM(a.q * c.q) AS BIGINT) AS qdot
  FROM qv a JOIN qv c ON a.i = c.i AND c.vec_id <> a.vec_id
  WHERE a.vec_id % 100 = 0
  GROUP BY a.vec_id, c.vec_id
), cand AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id) AS rn
    FROM s
  ) WHERE rn <= 25
), ex AS (
  SELECT cd.query_id, cd.cand_id,
    round(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) *
       sqrt(SUM(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))), 4) AS cos_sim
  FROM cand cd
  JOIN embeddings a ON a.vec_id = cd.query_id
  JOIN embeddings b ON b.vec_id = cd.cand_id, g
  GROUP BY cd.query_id, cd.cand_id
)
SELECT query_id, cand_id, cos_sim, rn AS rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rn
  FROM ex
) WHERE rn <= 5 ORDER BY query_id, rk""",

    "s9_write_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 2 AND l_returnflag IN ('N', 'R')
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_replace_truncate" ->
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
  CAST(0 AS BIGINT) AS post_truncate_rows, 'flag,n' AS columns
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1 ORDER BY 1""",

    "sql_maintenance_extras" ->
      """SELECT
  CAST((SELECT count(*) FROM lineitem WHERE l_quantity = 1) AS BIGINT)
    AS src_rows,
  CAST((SELECT sum(l_orderkey % 97) FROM lineitem WHERE l_quantity = 1)
    AS BIGINT) AS sum_key_mod,
  CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 2) AS BIGINT)
    AS clone_rows,
  CAST(0 AS BIGINT) AS post_reorg_dv_files,
  true AS reorg_physical,
  true AS dryrun_kept,
  true AS vacuum_deleted,
  true AS show_create_reruns""",

    "s37_row_tracking" ->
      """SELECT
  CAST((SELECT count(*) FROM lineitem
        WHERE l_quantity <= 2 AND l_orderkey % 3 <> 0) AS BIGINT) AS n_live,
  CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 2) - 1
    AS BIGINT) AS hwm_appends,
  CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 2) - 1
     + (SELECT count(*) FROM lineitem
        WHERE l_quantity <= 2 AND l_orderkey % 3 <> 0)
    AS BIGINT) AS hwm_final,
  true AS ids_unique, true AS ids_stable, true AS mark_monotone""",

    "s10_time_travel" ->
      """SELECT 'current' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
UNION ALL
SELECT 'v0' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2 AND l_linenumber % 2 = 0
ORDER BY snap""",

    "s12_stats_skipping" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity >= 3 AND l_quantity <= 4
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s13_schema_evolution" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(count(CASE WHEN l_linenumber % 2 = 1 THEN 1 END) AS BIGINT) AS n_disc,
  sum(CASE WHEN l_linenumber % 2 = 1 THEN round(l_discount * 100) END) / 100.0 AS sum_disc
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_select" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 2 AND l_returnflag IN ('N', 'R')
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_time_travel" ->
      """SELECT 'current' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
UNION ALL
SELECT 'v0' AS snap, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2 AND l_linenumber % 2 = 0
ORDER BY snap""",

    "sql_create" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
   WHERE l_quantity <= 2 AND l_returnflag = 'R') AS n_r
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_alter" ->
      """SELECT l_returnflag,
  CASE WHEN l_quantity = 1 THEN 'legacy' ELSE 'evolved' END AS src,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS verbs_ok
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1, 2 ORDER BY 1, 2""",

    "sql_replace_columns" ->
      """SELECT l_returnflag AS flag,
  CASE WHEN l_quantity = 1 THEN 'legacy' ELSE 'post' END AS src,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS order_ok, CAST(1 AS BIGINT) AS tt_ok,
  CAST(1 AS BIGINT) AS cdf_refuse_ok,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity = 2)
    AS cdf_rows
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1, 2 ORDER BY 1, 2""",

    "sql_insert" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_call_lifecycle" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_delete_update" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(CASE WHEN l_quantity = 1 THEN 0 ELSE l_extendedprice END
            * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 2 AND NOT (l_quantity = 2 AND l_orderkey % 3 = 0)
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_merge" ->
      """WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         l_returnflag
  FROM lineitem WHERE l_quantity <= 2
  QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
    ORDER BY l_quantity, l_extendedprice, l_returnflag) = 1
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(CASE WHEN l_linenumber % 2 = 0 THEN 0 ELSE l_extendedprice END
            * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM base
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_insert_overwrite" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2 AND l_returnflag = 'R'
GROUP BY l_returnflag ORDER BY l_returnflag""",

    // SHOW PARTITIONS returns Spark's k=v/k=v wire shape; the oracle
    // derives the same strings from the source rows the gate appended
    "sql_show_partitions" ->
      """SELECT 'l_returnflag=' || l_returnflag ||
    '/l_linestatus=' || l_linestatus AS "partition"
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1 ORDER BY 1""",

    "sql_tblproperties" ->
      """SELECT * FROM (VALUES
  ('delta.appendOnly', 'false', 'all'),
  ('delta.checkpointInterval', '5', 'all'),
  ('delta.checkpointInterval', '5', 'keyed'))
  t("key", "value", via)
ORDER BY via, "key" """,

    "sql_describe" ->
      """SELECT * FROM (VALUES
  ('l_orderkey', 'bigint', CAST(NULL AS VARCHAR)),
  ('l_linenumber', 'int', NULL),
  ('l_quantity', 'double', NULL),
  ('l_extendedprice', 'double', NULL),
  ('l_returnflag', 'string', NULL),
  ('# Partition Information', '', ''),
  ('# col_name', 'data_type', 'comment'),
  ('l_returnflag', 'string', NULL))
  t(col_name, data_type, comment)""",

    // the mapped-lifecycle readback: every qty<=2 row except the
    // DELETEd ones, under the renamed column, minus the dropped one
    // sum_meta recomputes the r17 nested-alter leg: meta.qty2 (the
    // renamed meta.a) carries l_quantity on the ODD-linenumber append
    // only; every other row reads the evolved struct as NULL
    "s34_column_rename" ->
      """WITH kept AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity <= 2
    AND NOT (l_quantity = 2 AND l_orderkey % 3 = 0))
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  sum(round((CASE WHEN l_linenumber % 2 = 1 THEN l_quantity END)
    * 100)) / 100.0 AS sum_meta,
  CAST(4 AS INTEGER) AS n_cols
FROM kept""",

    // the 'ALL' row is DESCRIBE DETAIL's census: numFiles = one file
    // per partition value after the z-ordered compaction, numRows =
    // stats-folded live rows (stats inherited/z-order-added by OPTIMIZE)
    "sql_verbs_lifecycle" ->
      """SELECT * FROM (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
    sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem WHERE l_quantity <= 2
  GROUP BY l_returnflag
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT l_returnflag) AS BIGINT), 0.0,
    CAST(count(*) AS BIGINT)
  FROM lineitem WHERE l_quantity <= 2
) ORDER BY l_returnflag""",

    // the assigned identity SET is fully determined even though the
    // row-to-value mapping is scheduler-dependent: n distinct values
    // walking 1000, 1003, ... with no collisions across commits
    "s36_identity" ->
      """WITH final AS (
  SELECT CASE WHEN l_quantity = 1 THEN 11.0
              WHEN l_quantity = 2 AND l_orderkey % 7 = 0 THEN 12.0
              ELSE l_quantity END AS q,
         CASE WHEN l_quantity = 2 AND l_orderkey % 7 = 0 THEN 'T'
              END AS tag
  FROM lineitem WHERE l_quantity <= 2
  UNION ALL
  SELECT l_quantity AS q, NULL AS tag
  FROM lineitem WHERE l_quantity = 3
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) AS BIGINT) AS n_ids,
  CAST(1000 AS BIGINT) AS min_id,
  CAST(1000 + 3 * (count(*) - 1) AS BIGINT) AS max_id,
  CAST(sum(CAST(q AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(count(tag) AS BIGINT) AS n_tagged
FROM final""",

    // the oracle recomputes the generated bucket and the update's
    // price-zeroing directly from the source
    "s35_generated" ->
      """SELECT l_orderkey % 5 AS bucket,
  CAST(count(*) AS BIGINT) AS n_rows,
  sum(round((CASE WHEN l_quantity = 1 THEN 0.0
             ELSE l_extendedprice END) * 100)) / 100.0 AS sum_price
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1 ORDER BY 1""",

    // mirrors s20's reconstruction rule: only rows the UPDATE changed
    // appear as pre/postimages (price already 0 cancels in the diff);
    // commit_version is deterministic (v1 update, v2 delete) and every
    // change row carries a commit timestamp (n_ts == n_rows)
    "sql_table_changes" ->
      """WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity <= 2),
upd AS (SELECT * FROM src WHERE l_quantity = 1),
del AS (SELECT * FROM src WHERE l_quantity = 2 AND l_orderkey % 3 = 0),
up2 AS (SELECT * FROM src WHERE l_quantity = 2 AND l_orderkey % 3 = 1)
SELECT * FROM (
  SELECT 'delete' AS change_type, CAST(3 AS BIGINT) AS commit_version,
         CAST(count(*) AS BIGINT) AS n_rows,
         sum(round(l_extendedprice*100))/100.0 AS sum_price,
         CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
         CAST(count(*) AS BIGINT) AS n_ts FROM del
  UNION ALL
  SELECT 'update_postimage', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         0.0, CAST(sum(l_linenumber) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM upd
  UNION ALL
  SELECT 'update_preimage', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         sum(round(l_extendedprice*100))/100.0,
         CAST(sum(l_linenumber) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM upd
  UNION ALL
  SELECT 'update_postimage', CAST(5 AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(count(*) AS DOUBLE),
         CAST(sum(l_linenumber) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM up2
  UNION ALL
  SELECT 'update_preimage', CAST(5 AS BIGINT), CAST(count(*) AS BIGINT),
         sum(round(l_extendedprice*100))/100.0,
         CAST(sum(l_linenumber) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM up2
) ORDER BY change_type, commit_version""",

    "s33_detail" ->
      """SELECT 'graft-delta' AS format, 'l_returnflag' AS part_cols,
  CAST(2 * count(DISTINCT l_returnflag) AS BIGINT) AS num_files,
  CAST(count(*) AS BIGINT) AS num_rows,
  CAST(1 AS INTEGER) AS min_reader, CAST(2 AS INTEGER) AS min_writer
FROM lineitem WHERE l_quantity <= 2""",

    "s27_real_format" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_regionkey >= 2 ORDER BY n_nationkey""",

    "s30_colmap_id" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
  CAST(count(*) AS BIGINT) AS n_nations,
  max(n_name) AS max_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "s39_cdf_write" ->
      """WITH base AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity <= 2
)
SELECT 'delete' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS cdc_present
FROM base WHERE flag = 'R' AND qty = 2 GROUP BY flag
UNION ALL
SELECT 'update_preimage' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS cdc_present
FROM base WHERE flag = 'A' AND qty = 1 GROUP BY flag
UNION ALL
SELECT 'update_postimage' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty + 5) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS cdc_present
FROM base WHERE flag = 'A' AND qty = 1 GROUP BY flag
ORDER BY change_type, flag""",

    "s40_mapped_cdf" ->
      """WITH base AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity <= 2
)
SELECT 'delete' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS phys_cols_ok,
  CAST(1 AS BIGINT) AS evolve_ok
FROM base WHERE flag = 'R' AND qty = 2 GROUP BY flag
UNION ALL
SELECT 'update_preimage' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS phys_cols_ok,
  CAST(1 AS BIGINT) AS evolve_ok
FROM base WHERE flag = 'A' AND qty = 1 GROUP BY flag
UNION ALL
SELECT 'update_postimage' AS change_type, flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty + 5) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS phys_cols_ok,
  CAST(1 AS BIGINT) AS evolve_ok
FROM base WHERE flag = 'A' AND qty = 1 GROUP BY flag
ORDER BY change_type, flag""",

    "s41_defaults" ->
      """WITH eras AS (
  SELECT 'new' AS status, CAST(l_quantity AS BIGINT) AS qty,
    CAST(0 AS BIGINT) AS boost, CAST(NULL AS BIGINT) AS bump
  FROM lineitem WHERE l_quantity <= 2 AND l_orderkey % 2 = 0
  UNION ALL
  SELECT 'adj' AS status, CAST(l_quantity AS BIGINT) AS qty,
    CAST(7 AS BIGINT) AS boost, CAST(NULL AS BIGINT) AS bump
  FROM lineitem WHERE l_quantity <= 2 AND l_orderkey % 2 = 1
  UNION ALL
  SELECT 'adj' AS status, CAST(l_quantity AS BIGINT) AS qty,
    CAST(7 AS BIGINT) AS boost, CAST(5 AS BIGINT) AS bump
  FROM lineitem WHERE l_quantity = 3
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(sum(boost) AS BIGINT) AS sum_boost,
  CAST(sum(bump) AS BIGINT) AS sum_bump
FROM eras GROUP BY status ORDER BY status""",

    "s42_clustered" ->
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS files_skip_ok
FROM lineitem WHERE l_quantity <= 3
GROUP BY 1 ORDER BY 1""",

    "s45_merge_delete" ->
      """WITH base AS (
  SELECT l_orderkey AS okey, CAST(l_quantity AS BIGINT) AS qty,
    l_returnflag AS flag
  FROM lineitem WHERE l_quantity <= 3
)
SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty
FROM base
WHERE NOT (flag = 'R' AND okey IN (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity = 2))
  AND okey IN (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity = 1)
GROUP BY 1 ORDER BY 1""",

    "s46_merge_clauses" ->
      """WITH base AS (
  SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum,
    CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag
  FROM lineitem WHERE l_quantity <= 3
), src AS (
  SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum,
    CAST(min(l_quantity) AS BIGINT) AS qty, min(l_returnflag) AS flag
  FROM lineitem WHERE l_quantity IN (2, 3, 4) GROUP BY 1, 2
), merged AS (
  SELECT b.okey, b.lnum,
    CASE WHEN s.okey IS NOT NULL AND NOT s.flag = 'R' AND s.qty = 2
         THEN b.qty + 100 ELSE b.qty END AS qty,
    CASE WHEN s.okey IS NOT NULL AND NOT s.flag = 'R' AND s.qty = 2
         THEN 'U'
         WHEN s.okey IS NULL AND NOT b.flag = 'N' THEN 'S'
         ELSE b.flag END AS flag
  FROM base b LEFT JOIN src s ON b.okey = s.okey AND b.lnum = s.lnum
  WHERE NOT (s.okey IS NOT NULL AND s.flag = 'R')
  UNION ALL
  SELECT s.okey, s.lnum, s.qty * 10 AS qty, 'I' AS flag
  FROM src s LEFT JOIN (SELECT DISTINCT okey, lnum FROM base) b
    ON b.okey = s.okey AND b.lnum = s.lnum
  WHERE b.okey IS NULL AND NOT s.flag = 'R'
), src2 AS (
  SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lnum,
    CAST(count(*) AS BIGINT) AS hits
  FROM lineitem WHERE l_quantity = 1 GROUP BY 1, 2
), evolved AS (
  SELECT m.okey, m.lnum, m.qty, m.flag, s.hits AS score
  FROM merged m LEFT JOIN src2 s ON m.okey = s.okey AND m.lnum = s.lnum
  UNION ALL
  SELECT s.okey, s.lnum, 0 AS qty, 'E' AS flag, s.hits AS score
  FROM src2 s LEFT JOIN (SELECT DISTINCT okey, lnum FROM merged) m
    ON m.okey = s.okey AND m.lnum = s.lnum
  WHERE m.okey IS NULL
)
SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(count(score) AS BIGINT) AS n_scored,
  CAST(sum(score) AS BIGINT) AS sum_score
FROM evolved GROUP BY flag ORDER BY flag""",

    "s49_merge_identity" ->
      """WITH m1 AS (
  SELECT l_orderkey AS okey, CAST(min(l_quantity) AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity <= 2 GROUP BY 1
), m2 AS (
  SELECT l_orderkey AS okey, CAST(min(l_quantity) AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity IN (2, 3) GROUP BY 1
), final AS (
  SELECT CASE WHEN m2.okey IS NOT NULL THEN m1.qty + 100
              ELSE m1.qty END AS qty
  FROM m1 LEFT JOIN m2 ON m1.okey = m2.okey
  UNION ALL
  SELECT m2.qty * 10 AS qty
  FROM m2 LEFT JOIN m1 ON m1.okey = m2.okey
  WHERE m1.okey IS NULL
), n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM final)
SELECT n.c AS n_rows, n.c AS n_ids, CAST(1 AS BIGINT) AS min_id,
  n.c AS max_id, CAST(n.c * (n.c + 1) / 2 AS BIGINT) AS sum_id,
  (SELECT CAST(sum(qty) AS BIGINT) FROM final) AS sum_qty
FROM n""",

    "s50_auto_optimize" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s48_drop_feature" ->
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 3 AND l_returnflag <> 'R'
GROUP BY 1 ORDER BY 1""",

    "s47_generated_prune" ->
      """WITH survived AS (
  SELECT event_id, ts,
    CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00'
         THEN 'archived' ELSE event_type END AS event_type
  FROM events
  WHERE ts > TIMESTAMP '2024-01-21 23:59:59'
)
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(event_id) AS BIGINT) AS sum_id
FROM survived
WHERE ts BETWEEN TIMESTAMP '2024-01-20 00:00:00'
             AND TIMESTAMP '2024-01-27 23:59:59'
GROUP BY 1, 2 ORDER BY 1, 2""",

    "s44_variant" ->
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 3
  AND NOT (l_quantity = 3 AND l_returnflag = 'R')
GROUP BY 1 ORDER BY 1""",

    "s43_type_widening" ->
      """WITH eras AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
    CAST(NULL AS BIGINT) AS v
  FROM lineitem WHERE l_quantity <= 2
  UNION ALL
  SELECT l_returnflag AS flag,
    CAST(l_quantity AS BIGINT) + 3000000000 AS qty,
    CAST(NULL AS BIGINT) AS v
  FROM lineitem WHERE l_quantity = 3
  UNION ALL
  SELECT 'W' AS flag, CAST(sum(l_quantity) AS BIGINT) AS qty,
    CAST(count(*) AS BIGINT) * 2 AS v
  FROM lineitem WHERE l_quantity = 4 GROUP BY l_orderkey
)
SELECT flag, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(qty) AS BIGINT) AS sum_qty,
  CAST(sum(v) AS BIGINT) AS sum_v,
  CAST(1 AS BIGINT) AS no_rewrite,
  CAST(1 AS BIGINT) AS widen_ok
FROM eras GROUP BY flag ORDER BY flag""",

    "s38_colmap_id_write" ->
      """SELECT l_returnflag AS flag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN l_returnflag = 'A'
       THEN CAST(l_quantity AS BIGINT) + 10
       ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT) AS sum_qty,
  CAST(1 AS BIGINT) AS footer_ids_ok
FROM lineitem
WHERE l_quantity <= 2
  AND NOT (l_quantity = 2 AND l_returnflag = 'R')
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s28_column_mapping" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
  max(n_name) AS max_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "s26_overwrite_where" ->
      """WITH final AS (
  SELECT l_returnflag, l_quantity, l_extendedprice FROM lineitem
  WHERE l_quantity = 2
  UNION ALL
  SELECT l_returnflag, l_quantity, 0.0 AS l_extendedprice FROM lineitem
  WHERE l_quantity = 1 AND l_returnflag <> 'R'
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM final GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s25_deletion_vectors" ->
      """WITH f AS (
  SELECT l_returnflag,
    CAST(CASE WHEN sum(CASE WHEN l_quantity = 1 THEN 1 ELSE 0 END) > 0
         THEN 1 ELSE 0 END AS BIGINT) AS n_dv
  FROM lineitem WHERE l_quantity <= 2 GROUP BY l_returnflag
)
SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l.l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  any_value(f.n_dv) AS n_dv
FROM lineitem l JOIN f USING (l_returnflag)
WHERE l.l_quantity = 2
GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",

    "s32_cow_over_dv" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(0 AS BIGINT) AS n_dv_total
FROM lineitem
WHERE l_quantity = 2 AND l_orderkey % 2 = 1
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s24_optimize_where" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS BIGINT) AS n_files
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s21_restore" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s22_clone" ->
      """WITH base AS (
  SELECT l_returnflag, l_quantity, l_extendedprice
  FROM lineitem WHERE l_quantity <= 2
), sides AS (
  SELECT 'clone' AS side, * FROM base WHERE l_quantity <> 1
  UNION ALL
  SELECT 'source' AS side, * FROM base WHERE l_quantity <> 2
)
SELECT side, l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM sides GROUP BY side, l_returnflag ORDER BY side, l_returnflag""",

    "s14_delete" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity = 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s15_update" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(CASE WHEN l_quantity = 1 THEN 0 ELSE round(l_extendedprice * 100) END) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s16_merge" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round((CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END) * 100)) / 100.0 AS sum_price
FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "s17_zorder" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 5 AND l_extendedprice >= 1000.0 AND l_extendedprice <= 3000.0
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "s18_incremental" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_quantity <= 2 AND l_linenumber % 3 <> 0
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "b1_bucketed_join" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_quantity <= 2
GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "s19_stream_consume" ->
      """SELECT CAST(l_linenumber % 3 AS BIGINT) AS version,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY 1 ORDER BY 1""",

    "s11_vacuum" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
  sum(round(l_extendedprice * 100)) / 100.0 AS sum_price,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_quantity <= 2
GROUP BY l_returnflag ORDER BY l_returnflag""",

    "d12_kmeans_cells" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
e AS (
  SELECT vec_id, g.i AS dim, CAST(embedding[g.i] AS DOUBLE) AS x
  FROM embeddings, g
),
c0 AS (SELECT vec_id AS cent_id, dim, x AS c FROM e WHERE vec_id < 8),
d0 AS (
  SELECT a.vec_id, b.cent_id,
    round(SUM(a.x*a.x) - 2*SUM(a.x*b.c) + SUM(b.c*b.c), 4) AS d2
  FROM e a JOIN c0 b USING (dim)
  GROUP BY a.vec_id, b.cent_id
),
a0 AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rk
    FROM d0) WHERE rk = 1
),
m AS (
  SELECT a0.cell, e.dim,
    CAST(CAST(round(avg(e.x), 4) AS REAL) AS DOUBLE) AS c
  FROM a0 JOIN e USING (vec_id)
  GROUP BY a0.cell, e.dim
),
c1 AS (
  SELECT c0.cent_id, c0.dim, coalesce(m.c, c0.c) AS c
  FROM c0 LEFT JOIN m ON m.cell = c0.cent_id AND m.dim = c0.dim
),
d1 AS (
  SELECT a.vec_id, b.cent_id,
    round(SUM(a.x*a.x) - 2*SUM(a.x*b.c) + SUM(b.c*b.c), 4) AS d2
  FROM e a JOIN c1 b USING (dim)
  GROUP BY a.vec_id, b.cent_id
),
a1 AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS rk
    FROM d1) WHERE rk = 1
)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(sum(vec_id) AS BIGINT) AS sum_ids
FROM a1 GROUP BY cell ORDER BY cell""",

    "sim_ivf_topk" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
c AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
ascore AS (
  SELECT e.vec_id, c.cent_id,
    round(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       sqrt(SUM(CAST(c.cv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)))), 4) AS cscore
  FROM embeddings e, c, g
  GROUP BY e.vec_id, c.cent_id
),
asg AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS rk
    FROM ascore) WHERE rk = 1
),
probes AS (
  SELECT query_id, cent_id AS cell FROM (
    SELECT a.vec_id AS query_id, a.cent_id,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY a.cscore DESC, a.cent_id) AS prk
    FROM ascore a WHERE a.vec_id % 100 = 0) WHERE prk <= 3
),
s AS (
  SELECT p.query_id, a.vec_id AS cand_id, a.cell,
    round(SUM(CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(eq.embedding[i] AS DOUBLE) * CAST(eq.embedding[i] AS DOUBLE))) *
       sqrt(SUM(CAST(ec.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))), 4) AS cos_sim
  FROM probes p
  JOIN asg a ON a.cell = p.cell
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings ec ON ec.vec_id = a.vec_id, g
  WHERE a.vec_id <> p.query_id
  GROUP BY p.query_id, a.vec_id, a.cell
)
SELECT query_id, cand_id, cell, cos_sim, rn AS rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rn
  FROM s
) WHERE rn <= 5 ORDER BY query_id, rk""",

    "d10_semdedup" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
c AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 10),
ascore AS (
  SELECT e.vec_id, c.cent_id,
    round(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)) /
      (sqrt(SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) *
       sqrt(SUM(CAST(c.cv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)))), 4) AS cscore
  FROM embeddings e, c, g
  GROUP BY e.vec_id, c.cent_id
),
asg AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS rk
    FROM ascore) WHERE rk = 1
),
pairs AS (
  SELECT a2.vec_id AS vec_b
  FROM asg a1 JOIN asg a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
  JOIN embeddings e1 ON e1.vec_id = a1.vec_id
  JOIN embeddings e2 ON e2.vec_id = a2.vec_id, g
  GROUP BY a1.vec_id, a2.vec_id
  HAVING round(SUM(CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)) /
    (sqrt(SUM(CAST(e1.embedding[i] AS DOUBLE) * CAST(e1.embedding[i] AS DOUBLE))) *
     sqrt(SUM(CAST(e2.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))), 4) >= 0.30
),
dropped AS (SELECT DISTINCT vec_b FROM pairs)
SELECT cell, CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN d.vec_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_b
GROUP BY cell ORDER BY cell""",

    "t1_langid" ->
      """WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
), scores AS (
  SELECT doc_id, 'en' AS cand_lang, CAST(sum(CASE WHEN token IN ('the','a','of','and','to','in','is') THEN 1 ELSE 0 END) AS BIGINT) AS hits FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'de', CAST(sum(CASE WHEN token IN ('der','die','das','und','ist','ein','zu') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'es', CAST(sum(CASE WHEN token IN ('el','la','de','y','es','un','en') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'fr', CAST(sum(CASE WHEN token IN ('le','la','et','les','est','un','dans') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'zh', CAST(sum(CASE WHEN token IN ('的','是','了','在','和','有','我') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
)
SELECT doc_id, cand_lang AS predicted, hits AS stopword_hits FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rk
  FROM scores
) WHERE rk = 1 ORDER BY doc_id""",

    "t2_quality_score" ->
      """WITH f AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
    CAST(length(list_filter(string_split(text, ' '),
      t -> t IN ('the','a','of','and','to','in','is','der','die','das','und','ist','ein','zu','el','la','de','y','es','un','en','le','et','les','est','dans','的','是','了','在','和','有','我'))) AS BIGINT) AS n_stops,
    CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_keep
  FROM documents
)
SELECT doc_id, n_chars_m, n_tokens,
  CAST(n_alpha AS DOUBLE) / n_chars_m AS alpha_ratio,
  CAST(n_stops AS DOUBLE) / n_tokens AS stopword_ratio,
  CAST(n_chars_m - n_keep AS DOUBLE) / n_chars_m AS punct_ratio,
  CAST(n_chars_m - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_token_len,
  CAST(n_alpha AS DOUBLE) / n_chars_m + CAST(n_stops AS DOUBLE) / n_tokens
    - CAST(n_chars_m - n_keep AS DOUBLE) / n_chars_m AS quality_score
FROM f ORDER BY doc_id""",

    "t8_pii_redact" ->
      """SELECT event_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        event_type || ' user=' || CAST(user_id AS VARCHAR) ||
          ' ip=10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
          CAST(event_id % 256 AS VARCHAR) ||
          ' mail=u' || CAST(user_id AS VARCHAR) || '@example.com ' || props,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
    '[0-9]{3,}', '<NUM>', 'g') AS redacted
FROM events WHERE event_id < 300 ORDER BY event_id""",

    "t9_source_overlap" ->
      """WITH fp AS (
  SELECT DISTINCT source,
    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(count(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.f = b.f AND a.source <= b.source
GROUP BY 1, 2 ORDER BY 1, 2""",

    "pipe4_token_shards" ->
      """WITH t AS (
  SELECT doc_id,
    CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM t
)
SELECT CAST(floor(cumb / 2000) AS BIGINT) AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1""",

    "pipe5_quality_cut" ->
      """WITH f AS (
  SELECT doc_id, lang,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
    CAST(length(list_filter(string_split(text, ' '),
      t -> t IN ('the','a','of','and','to','in','is','der','die','das','und','ist','ein','zu','el','la','de','y','es','un','en','le','et','les','est','dans','的','是','了','在','和','有','我'))) AS BIGINT) AS n_stops,
    CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_keep
  FROM documents
), s AS (
  SELECT doc_id, lang, n_tokens,
    CAST(n_alpha AS DOUBLE) / n_chars_m + CAST(n_stops AS DOUBLE) / n_tokens
      - CAST(n_chars_m - n_keep AS DOUBLE) / n_chars_m AS q
  FROM f
), r AS (
  SELECT lang, n_tokens, q,
    percent_rank() OVER (PARTITION BY lang ORDER BY q, doc_id) AS pr
  FROM s
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
  sum(round(q * 10000)) / 10000.0 AS sum_score
FROM r WHERE pr >= 1.0 - 0.7
GROUP BY lang ORDER BY lang""",

    "t3_token_count" ->
      """SELECT doc_id,
  CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
  CAST(length(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_regex_tokens
FROM documents ORDER BY doc_id""",

    "t4_fingerprint" ->
      """SELECT doc_id,
  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
  CAST(coalesce(list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
    (acc, x) -> (acc * 31 + x) % 1000000007), 0) AS BIGINT) AS rolling_hash
FROM documents ORDER BY doc_id""",

    "pipe1_clean_corpus" ->
      """WITH f AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(length(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
    CAST(length(list_filter(string_split(text, ' '),
      t -> t IN ('the','a','of','and','to','in','is','der','die','das','und','ist','ein','zu','el','la','de','y','es','un','en','le','et','les','est','dans','的','是','了','在','和','有','我'))) AS BIGINT) AS n_stops,
    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
), quality AS (
  SELECT doc_id FROM f
  WHERE CAST(n_alpha AS DOUBLE) / n_chars_m + CAST(n_stops AS DOUBLE) / n_tokens
        - CAST(n_punct AS DOUBLE) / n_chars_m >= 0.88
    AND n_tokens >= 20
), fp AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN quality q ON d.doc_id = q.doc_id
  GROUP BY md5(trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
), toks AS (
  SELECT d.doc_id, unnest(list_filter(string_split(d.text, ' '), t -> t <> '')) AS token
  FROM documents d JOIN fp ON d.doc_id = fp.doc_id
), scores AS (
  SELECT doc_id, 'en' AS cand_lang, CAST(sum(CASE WHEN token IN ('the','a','of','and','to','in','is') THEN 1 ELSE 0 END) AS BIGINT) AS hits FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'de', CAST(sum(CASE WHEN token IN ('der','die','das','und','ist','ein','zu') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'es', CAST(sum(CASE WHEN token IN ('el','la','de','y','es','un','en') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'fr', CAST(sum(CASE WHEN token IN ('le','la','et','les','est','un','dans') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'zh', CAST(sum(CASE WHEN token IN ('的','是','了','在','和','有','我') THEN 1 ELSE 0 END) AS BIGINT) FROM toks GROUP BY doc_id
), pred AS (
  SELECT doc_id, cand_lang AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rk
    FROM scores
  ) WHERE rk = 1
)
SELECT predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY predicted ORDER BY predicted""",

    // NOTE (m1/m2/m3): the engine computes BYTE-true metadata (see
    // Multimodal scaladoc + the non-ASCII cross-check specs); these
    // oracles express the same values through character functions,
    // which coincide because the fixture corpus is pure ASCII (byte ==
    // code point). DuckDB lacks blob byte indexing, so the byte-true
    // contract is gated by LlmSpec instead for non-ASCII payloads.
    "m2_multimodal_hist" ->
      """SELECT doc_id, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n
FROM (SELECT doc_id, ascii(substr(text, i, 1)) % 16 AS bin
      FROM (SELECT doc_id, text,
              unnest(generate_series(1, length(text))) AS i
            FROM documents)
      WHERE length(text) > 0)
GROUP BY doc_id, bin ORDER BY doc_id, bin""",

    "m3_resize_frames" ->
      """WITH meta AS (
  SELECT doc_id,
    1 + ascii(substr(text, 1, 1)) % 64 AS w,
    1 + ascii(substr(text, 2, 1)) % 64 AS h,
    1 + octet_length(encode(text)) % 7 AS n_frames
  FROM documents
)
SELECT doc_id,
  CAST(CASE WHEN greatest(w, h) <= 48 THEN w
       ELSE greatest(1, floor(w * 48 / greatest(w, h))) END AS BIGINT) AS fit_w,
  CAST(CASE WHEN greatest(w, h) <= 48 THEN h
       ELSE greatest(1, floor(h * 48 / greatest(w, h))) END AS BIGINT) AS fit_h,
  CAST(length(generate_series(0, n_frames - 1, 2)) AS BIGINT) AS n_sampled
FROM meta ORDER BY doc_id""",

    "m1_multimodal_meta" ->
      """SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  sha256(text) AS sha,
  CAST(1 + ascii(substr(text, 1, 1)) % 64 AS BIGINT) AS width,
  CAST(1 + ascii(substr(text, 2, 1)) % 64 AS BIGINT) AS height,
  CAST(1 + octet_length(encode(text)) % 7 AS BIGINT) AS n_frames
FROM documents ORDER BY doc_id""")
}
