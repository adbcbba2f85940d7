package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Coalesce, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.functions.{coalesce, expr, lit, raise_error}
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Write-time CHECK constraints (the Delta `CONSTRAINT ... CHECK`
  * model): the table property `graft.constraints` holds a JSON map of
  * {name: boolean SQL expression}; every writer rejects a batch whose
  * rows violate any of them, so bad data fails the WRITE instead of
  * poisoning downstream readers.
  *
  * Semantics match SQL CHECK: a row violates a constraint only when
  * the expression evaluates to FALSE — NULL (unknown) passes, exactly
  * like the standard. Expressions must be deterministic and
  * aggregate-free; they are analyzed against the write schema ONCE at
  * plan time (full Spark analysis, so functions resolve), then either
  * compiled to a per-row predicate (the DSv2 InternalRow writers — no
  * extra pass, no extra job) or fused into the write plan as a
  * `condition OR raise_error(...)` filter (the DataFrame writers — one
  * codegen'd pass, nothing for the optimizer to prune away).
  *
  * Enforcement covers NEW data only: compaction re-writes existing
  * rows verbatim and is exempt, the same line Delta draws. */
object Constraints {

  /** Table property: JSON object, constraint name -> SQL expression. */
  val Prop = "graft.constraints"

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def encode(cs: Map[String, String]): String = mapper.writeValueAsString(cs)

  /** Declared constraints of a snapshot's properties (sorted by name —
    * deterministic check order). */
  def of(properties: Map[String, String]): Seq[(String, String)] =
    properties.get(Prop).map { raw =>
      mapper.readValue(raw, classOf[Map[String, String]]).toSeq.sortBy(_._1)
    }.getOrElse(Nil)

  /** Parse + ANALYZE `sql` against the write schema and bind ordinals —
    * the full analyzer runs so functions resolve; the result is a
    * serializable bound expression tasks can compile. NULL-passing is
    * baked in here (coalesce(cond, true)) so every enforcement site
    * agrees. */
  def bind(spark: SparkSession, name: String, sql: String,
      schema: StructType): Expression = {
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    // analysis failures (unknown function, parse error) surface as the
    // same Config error every other malformed declaration gets — not a
    // raw AnalysisException that looks like an engine bug
    val analyzed = try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      spark.sessionState.analyzer.execute(Filter(parsed, LocalRelation(attrs)))
    } catch {
      case e: CompactionError => throw e
      case scala.util.control.NonFatal(e) => throw CompactionError.Config(
        s"constraint '$name' failed to analyze against the write schema " +
          s"(${schema.fieldNames.mkString(", ")}): $sql — ${e.getMessage}")
    }
    val cond = analyzed.collectFirst {
      case Filter(c, _) => c
    }.getOrElse(throw CompactionError.Config(
      s"constraint '$name' did not analyze to a filter: $sql"))
    // resolved FIRST: dataType on an unresolved attribute throws a raw
    // catalyst UnresolvedException before the friendlier checks run
    if (!cond.resolved) throw CompactionError.Config(
      s"constraint '$name' references columns outside the write schema " +
        s"(${schema.fieldNames.mkString(", ")}): $sql")
    if (cond.dataType != BooleanType) throw CompactionError.Config(
      s"constraint '$name' must be a boolean expression, got " +
        s"${cond.dataType.simpleString}: $sql")
    if (!cond.deterministic) throw CompactionError.Config(
      s"constraint '$name' must be deterministic: $sql")
    if (cond.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]))
      throw CompactionError.Config(
        s"constraint '$name' must not aggregate: $sql")
    BindReferences.bindReference(Coalesce(Seq(cond, Literal(true))), attrs)
  }

  /** All declared constraints bound against `schema` (driver-side). */
  def bindAll(spark: SparkSession, properties: Map[String, String],
      schema: StructType): Seq[(String, String, Expression)] =
    of(properties).map { case (n, s) => (n, s, bind(spark, n, s, schema)) }

  /** Executor-side per-row checker over bound expressions: compiled
    * lazily per task, throws on the first violating row. */
  final class RowChecker(
      bound: Seq[(String, String, Expression)]) extends Serializable {
    // Array + hoisted length: this runs per InternalRow on the hottest
    // writer path — a List-backed Seq would traverse from the head per
    // index per row
    @transient private lazy val preds = bound.map { case (n, s, e) =>
      val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
      p.initialize(0)
      (n, s, p)
    }.toArray
    def check(row: InternalRow): Unit = {
      val ps = preds
      var i = 0
      while (i < ps.length) {
        val (n, s, p) = ps(i)
        if (!p.eval(row)) throw CompactionError.Config(
          s"CHECK constraint '$n' violated: $s")
        i += 1
      }
    }
  }

  /** DataFrame-level twin: fuse `condition OR raise_error(...)` into
    * the plan as a filter — evaluated per row inside whole-stage
    * codegen, short-circuited when the constraint holds, impossible
    * for column pruning to drop. */
  def enforce(df: DataFrame, properties: Map[String, String]): DataFrame = {
    val cs = of(properties)
    if (cs.isEmpty) return df
    // validate through the same analyzer path the row writers use, so a
    // malformed declaration fails loudly and identically everywhere
    cs.foreach { case (n, s) => bind(df.sparkSession, n, s, df.schema) }
    cs.foldLeft(df) { case (d, (name, sql)) =>
      val pass: Column = coalesce(expr(sql), lit(true))
      d.filter(pass || raise_error(
        lit(s"CHECK constraint '$name' violated: $sql")))
    }
  }
}
