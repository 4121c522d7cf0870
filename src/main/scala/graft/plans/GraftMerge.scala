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
    * Some only for the two graft relation shapes. Shared with
    * [[GraftUpdateRule]]. */
  private[plans] def rootOfTarget(plan: LogicalPlan): Option[String] = rootOf(plan)

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

/** `UPDATE` for graft tables (round 19, completing the DML matrix):
  * the SQL statement
  *
  * {{{ UPDATE graft.db.t SET v = concat(v, '!') WHERE k IN (1, 2) }}}
  *
  * routes to the scoped-rewrite primitives [[TxTable.updateKeys]] /
  * [[TxTable.updateRange]] — only dirs whose skipping stats admit the
  * WHERE shape are rewritten, everything else carries by reference.
  * Accepted WHERE shapes mirror SQL DELETE's: a point/IN set on one
  * column, or a closed numeric range (strict bounds tightened ±1 for
  * integral literals, where the tightening is exact). SET assignments
  * may be arbitrary expressions over the table's own columns (they
  * re-resolve by NAME inside the rewrite, and cast to the column's
  * existing type — the schema contract is unchanged by construction).
  * Everything else — subqueries, unconditioned UPDATE (a whole-table
  * rewrite; spell it as INSERT OVERWRITE ... SELECT), non-key
  * predicates — fails loudly with the contract spelled out. */
object GraftUpdateRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, And => CAnd, In => CIn, GreaterThan => CGt, GreaterThanOrEqual => CGte, LessThan => CLt, LessThanOrEqual => CLte}
  import org.apache.spark.sql.catalyst.CatalystTypeConverters

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.childrenResolved && GraftMergeRule.rootOfTarget(target).isDefined =>
      rewrite(u, target, assignments, condition,
        GraftMergeRule.rootOfTarget(target).get)
  }

  private def fail(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft UPDATE supports SET <col> = <expression over the table's " +
        "columns> with a WHERE that is a point/IN set or a closed " +
        s"numeric range on one column — $why. For whole-table rewrites " +
        "use INSERT OVERWRITE ... SELECT; for exotic predicates use the " +
        "DataFrame API.")

  private def uncast(e: Expression): Expression = e match {
    case c: Cast => uncast(c.child)
    case other   => other
  }

  /** A constant side of the predicate, however the analyzer wrapped it
    * (bare literal, cast-of-literal, any deterministic foldable). */
  private def litOf(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case f if f.foldable && f.deterministic =>
      try Some(Literal.create(f.eval(), f.dataType))
      catch { case _: Exception => None }
    case _ => None
  }

  private def scalaValue(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  private def integralValue(l: Literal): Option[Long] = scalaValue(l) match {
    case b: Byte => Some(b.toLong); case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong);  case lo: Long => Some(lo)
    case _ => None
  }

  /** The literal as a Double ONLY when exact — a BIGINT/DECIMAL bound
    * that doubleValue() would round must be refused (loud), never
    * silently shifted onto neighboring keys (r19 reviewer). Shares
    * [[graft.sources.GraftTable.exactDouble]]'s round-trip rules. */
  private def numericValue(l: Literal): Option[Double] =
    graft.sources.GraftTable.exactDouble(scalaValue(l))

  private def rewrite(u: UpdateTable, target: LogicalPlan,
                      assignments: Seq[Assignment],
                      condition: Option[Expression], root: String): LogicalPlan = {
    val targetOut = target.outputSet
    // SET: target column := expression over target columns only
    val set = assignments.map {
      case Assignment(k: AttributeReference, v) if targetOut.contains(k) =>
        if (v.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
          fail("SET expressions cannot contain subqueries")
        val foreign = v.references.filterNot(targetOut.contains)
        if (foreign.nonEmpty)
          fail(s"SET references non-table columns: ${foreign.map(_.name).mkString(", ")}")
        // re-anchor by NAME: the expression re-resolves inside the
        // scoped rewrite's own read of the table
        k.name -> v.transform { case a: AttributeReference =>
          UnresolvedAttribute.quoted(a.name) }
      case a => fail(s"unsupported assignment ${a.key.sql} = ${a.value.sql}")
    }

    // WHERE → the scoped shape
    def attrLit(l: Expression, r: Expression): Option[(AttributeReference, Literal)] =
      (uncast(l), uncast(r)) match {
        case (a: AttributeReference, rhs) if targetOut.contains(a) =>
          litOf(rhs).map(lit => (a, lit))
        case (lhs, a: AttributeReference) if targetOut.contains(a) =>
          litOf(lhs).map(lit => (a, lit))
        case _ => None
      }
    // strict bounds: exact only for integral literals. The attribute
    // must sit on the LEFT (the flipped `lit < col` form would need
    // direction inversion — refuse it rather than risk mis-translating)
    def attrLeft(l: Expression, r: Expression): Option[(AttributeReference, Literal)] =
      (uncast(l), uncast(r)) match {
        case (a: AttributeReference, rhs) if targetOut.contains(a) =>
          litOf(rhs).map(lit => (a, lit))
        case _ => None
      }
    def rangeBound(e: Expression): Option[(String, Double, Double)] = e match {
      case CGt(l, r) => attrLeft(l, r).flatMap { case (a, lit) =>
        integralValue(lit).flatMap(graft.sources.GraftTable.strictLower)
          .map(v => (a.name, v, Double.PositiveInfinity)) }
      case CLt(l, r) => attrLeft(l, r).flatMap { case (a, lit) =>
        integralValue(lit).flatMap(graft.sources.GraftTable.strictUpper)
          .map(v => (a.name, Double.NegativeInfinity, v)) }
      case CGte(l, r) => attrLeft(l, r).flatMap { case (a, lit) =>
        numericValue(lit).map(v => (a.name, v, Double.PositiveInfinity)) }
      case CLte(l, r) => attrLeft(l, r).flatMap { case (a, lit) =>
        numericValue(lit).map(v => (a.name, Double.NegativeInfinity, v)) }
      case _ => None
    }
    def flatten(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => flatten(l) ++ flatten(r)
      case other      => Seq(other)
    }

    val cond = condition.getOrElse(fail(
      "unconditioned UPDATE is a whole-table rewrite"))
    val shape: (String, Either[Seq[Any], (Double, Double)]) = cond match {
      case EqualTo(l, r) if attrLit(l, r).isDefined =>
        val (a, lit) = attrLit(l, r).get
        val v = scalaValue(lit)
        if (v == null) fail("NULL never matches an equality")
        (a.name, Left(Seq(v)))
      case CIn(v, list) if uncast(v).isInstanceOf[AttributeReference] &&
          targetOut.contains(uncast(v).asInstanceOf[AttributeReference]) &&
          list.forall(litOf(_).isDefined) =>
        val vs = list.map(l => scalaValue(litOf(l).get))
        if (vs.exists(_ == null)) fail("NULL never matches IN")
        (uncast(v).asInstanceOf[AttributeReference].name, Left(vs))
      case other =>
        val bounds = flatten(other).map(rangeBound)
        if (bounds.exists(_.isEmpty)) fail(s"untranslatable WHERE: ${other.sql}")
        val bs = bounds.flatten
        if (bs.map(_._1).distinct.length != 1)
          fail("the WHERE range must constrain exactly one column")
        (bs.head._1, Right((bs.map(_._2).max, bs.map(_._3).min)))
    }
    GraftUpdateCommand(root, shape._1, shape._2, set)
  }
}

/** The rewritten UPDATE: route the translated WHERE shape + named SET
  * expressions to the scoped-rewrite primitive. */
final case class GraftUpdateCommand(root: String, column: String,
                                    where: Either[Seq[Any], (Double, Double)],
                                    set: Seq[(String, Expression)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cols = set.map { case (n, e) => n -> GraftBridge.column(e) }
    where match {
      case Left(values)    => TxTable.updateKeys(spark, root, column, values, cols)
      case Right((lo, hi)) => TxTable.updateRange(spark, root, column, lo, hi, cols)
    }
    Nil
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
    // SQL MERGE cardinality rule: a source with duplicate merge keys
    // would land BOTH rows (the upsert is anti-join + union), silently
    // duplicating a keyed table where SQL — and Delta — require an
    // error (r19 reviewer). One map-side-partial aggregation over the
    // source (limit 1 stops at the first offender); the merge itself
    // already pays a full source pass, so this is a bounded pre-check,
    // not a second join.
    val dup = aligned.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new UnsupportedOperationException(
      s"MERGE INTO source has duplicate rows for merge key '$key' " +
        s"(e.g. ${dup.head.get(0)}) — SQL MERGE forbids updating a " +
        "target row from more than one source row; de-duplicate the " +
        "source (GROUP BY the key) and re-run")
    TxTable.mergeUpsert(spark, root, aligned, key)
    Nil
  }
}
