package graft

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Beyond-reference extension queries (SURVEY.md §2.C/§7.6): text analysis,
  * deduplication, similarity search — the operations a large-scale
  * training-data pipeline needs, each oracle-checked against DuckDB where
  * SQL-expressible (md5-based hashing keeps the hash paths portable).
  *
  * r14: split into per-family traits (the maps grew past 13k lines in one
  * object); this object aggregates them behind the SAME public API.
  */
object ExtensionQueries extends ExtQueriesBase
    with ExtDedupQueries
    with ExtAnnQueries
    with ExtTextQueries
    with ExtTextStatsQueries
    with ExtGraphQueries
    with ExtStreamQueries
    with ExtGovernanceQueries
    with ExtAnalyticsQueries
{

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    dedupannQueries ++ annQueries ++ textQueries ++ textstatsQueries ++ graphQueries ++ streamQueries ++ governanceQueries ++ analyticsQueries

  def oracleSql: Map[String, String] =
    (dedupannOracles ++ annOracles ++ textOracles ++ textstatsOracles ++ graphOracles ++ streamOracles ++ governanceOracles ++ analyticsOracles)
      .pipe(m =>
    // the stream twins drain the same parquet into the same additive
    // cells, so the batch oracles gate them bit-for-bit
    m + ("x238_stream_msprt" -> m("x234_msprt")) +
      ("x247_stream_secret_scan" -> m("x242_secret_scan")) +
      ("x258_stream_gini" -> m("x255_source_gini")) +
      ("x263_stream_dp_counts" -> m("x254_dp_counts")))
}
