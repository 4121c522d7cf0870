package graft.plans

import graft.etl.TxTable
import graft.sources.{GraftTable, GraftTableRelation}

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col

/** `MERGE INTO` for graft tables (round-19 verdict task 3): the
  * canonical SQL upsert
  *
  * {{{
  * MERGE INTO graft.db.t AS t USING src AS s
  *   ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * routed to [[TxTable.mergeUpsert]] — the same transactional
  * last-writer-wins commit `Gold.upsert` and the q79 pipeline make, now
  * reachable by table NAME from pure SQL. Spark's own MERGE planning
  * requires the target to implement `SupportsRowLevelOperations` (the
  * copy-on-write scan+replace protocol); graft's table format already
  * HAS a native whole-table merge primitive with optimistic rebase, so
  * this analysis rule recognizes the resolved [[MergeIntoTable]] over a
  * graft relation and rewrites it to a command invoking that primitive
  * directly — the same altitude Delta's own `PreprocessTableMerge`
  * rule family occupies.
  *
  * Supported shape = exactly the upsert [[TxTable.mergeUpsert]]
  * implements: a single same-named equality key in ON, `WHEN MATCHED
  * THEN UPDATE SET *` (or the fully-aligned per-column equivalent
  * Spark's analyzer expands `*` into), `WHEN NOT MATCHED THEN INSERT *`
  * (ditto), no conditional clauses, no DELETE, no
  * NOT MATCHED BY SOURCE. Anything else fails LOUDLY with the contract
  * spelled out — silently approximating a conditional merge with an
  * unconditional upsert would corrupt data.
  *
  * Registered by [[GraftSparkExtensions]] as a post-hoc resolution
  * rule: it sees the fully-resolved merge (Spark has already expanded
  * `*`, aligned assignment columns, and resolved the key references)
  * and runs before Spark's row-level-operation check would reject the
  * plan. Scale: the source side is an arbitrary resolved plan (never
  * collected); the merge itself is the anti-join + union commit whose
  * 100 TB posture is argued at [[graft.etl.Gold.merge]] — the target
  * table never shuffles.
  */
object GraftMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.childrenResolved && rootOf(m.targetTable).isDefined =>
      rewrite(m, rootOf(m.targetTable).get)
  }

  /** The graft table root under the (possibly aliased) target relation:
    * Some only for the two graft relation shapes. */
  private def rootOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => rootOf(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t.root)
      case _             => None
    }
    case l: LogicalRelation => l.relation match {
      case r: GraftTableRelation => Some(r.root)
      case _                     => None
    }
    case _ => None
  }

  private def fail(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports exactly the transactional upsert: " +
        "ON target.key = source.key (one same-named key), WHEN MATCHED " +
        "THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT * — " +
        s"$why. For conditional/deleting merges use the DataFrame API " +
        "(TxTable.deleteKeys / foreachBatch + mergeUpsertPartitioned).")

  private def rewrite(m: MergeIntoTable, root: String): LogicalPlan = {
    if (m.withSchemaEvolution)
      fail("WITH SCHEMA EVOLUTION is not supported here (evolve the " +
        "schema through a write with option evolve=true)")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet

    // ON: exactly one equality between same-named target/source columns
    // (Spark wraps a type-mismatched side in a cast — still the
    // identity key; the command re-casts the whole source to the
    // target's types anyway)
    def uncast(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => uncast(c.child)
      case other => other
    }
    val key = m.mergeCondition match {
      case EqualTo(l, r) if uncast(l).isInstanceOf[AttributeReference] &&
          uncast(r).isInstanceOf[AttributeReference] =>
        val a = uncast(l).asInstanceOf[AttributeReference]
        val b = uncast(r).asInstanceOf[AttributeReference]
        val (t, s) =
          if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
          else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
          else fail("the ON condition must compare a target column to a source column")
        if (!t.name.equalsIgnoreCase(s.name))
          fail(s"the ON columns must be same-named (got ${t.name} = ${s.name})")
        t.name
      case other =>
        fail(s"the ON condition must be a single equality, got: ${other.sql}")
    }

    // WHEN MATCHED: one unconditional UPDATE SET * (or its expansion)
    m.matchedActions match {
      case Seq(UpdateStarAction(None)) => ()
      case Seq(UpdateAction(None, assignments, _)) =>
        requireStarAssignments(assignments, targetOut, sourceOut, "UPDATE")
      case other => fail(s"WHEN MATCHED must be exactly one unconditional " +
        s"UPDATE SET *, got: $other")
    }
    // WHEN NOT MATCHED: one unconditional INSERT * (or its expansion)
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertAction(None, assignments)) =>
        requireStarAssignments(assignments, targetOut, sourceOut, "INSERT")
      case other => fail(s"WHEN NOT MATCHED must be exactly one " +
        s"unconditional INSERT *, got: $other")
    }

    val targetSchema = m.targetTable.schema
    GraftMergeCommand(root, m.sourceTable, key, targetSchema)
  }

  /** An expanded `SET *` / `INSERT *`: every assignment writes a target
    * column from the SAME-NAMED source column (no expressions, no
    * renames, full coverage is Spark's own alignment guarantee). */
  private def requireStarAssignments(assignments: Seq[Assignment],
                                     targetOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
                                     sourceOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
                                     what: String): Unit =
    assignments.foreach {
      case Assignment(k: AttributeReference, v: AttributeReference)
        if targetOut.contains(k) && sourceOut.contains(v) &&
          k.name.equalsIgnoreCase(v.name) => ()
      case Assignment(k: AttributeReference, v)
        if targetOut.contains(k) && sameNamedCast(k, v, sourceOut) => ()
      case a => fail(s"$what assigns ${a.key.sql} from ${a.value.sql} — " +
        "only the identity column mapping of SET */INSERT * is supported")
    }

  /** Spark's alignment may wrap a source column in a cast to the target
    * column's type — still the identity mapping. */
  private def sameNamedCast(k: AttributeReference, v: Expression,
                            sourceOut: org.apache.spark.sql.catalyst.expressions.AttributeSet): Boolean =
    v match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => sameNamedCast(k, c.child, sourceOut)
      case a: AttributeReference => sourceOut.contains(a) && k.name.equalsIgnoreCase(a.name)
      case _ => false
    }
}

/** The rewritten MERGE: evaluate the source plan, align it to the
  * target schema by NAME with target-typed casts (the star-action
  * semantics — the source's column ORDER must not matter), and commit
  * through the optimistic-rebase upsert. */
final case class GraftMergeCommand(root: String, source: LogicalPlan,
                                   key: String,
                                   targetSchema: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftBridge.ofRows(spark, source)
    val aligned = src.select(targetSchema.fields.toIndexedSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    TxTable.mergeUpsert(spark, root, aligned, key)
    Nil
  }
}
