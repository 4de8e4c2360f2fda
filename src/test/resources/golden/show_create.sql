CREATE TABLE graft.golden_t (
  `id` BIGINT NOT NULL,
  `year` STRING,
  `payload` STRING)
USING delta
PARTITIONED BY (year)
LOCATION '<location>'
TBLPROPERTIES (
  'delta.enableDeletionVectors' = 'true')