package graft.sources

import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageType
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** One pushed point-lookup conjunct: `col = v` or `col IN (vs)` — an OR
  * over the values of ONE column, AND-composed with every other pushed
  * predicate. Carried to executors (plain case class, serializable) so
  * each reader can hand parquet an exact `FilterPredicate` and let the
  * library's OWN row-group filtering — min/max statistics, dictionary
  * pages, and BLOOM filters — skip groups before any data page is read.
  * Exactly one of `longs`/`strs` is non-empty (integral/temporal values
  * arrive as the micros/days/int64 integers the stats are in).
  */
final case class VlogPointPred(col: String, longs: Seq[Long],
    strs: Seq[String], nullTest: Option[Boolean] = None)

object VlogPointPred {
  /** `col IS NULL` (test=true) / `col IS NOT NULL` (test=false) — exact
    * predicates parquet evaluates from per-group NULL COUNTS alone: an
    * IS NULL probe skips every group with zero nulls (the "which rows
    * still lack the evolved column" audit on a 100-TB table), IS NOT
    * NULL skips all-null groups.
    */
  def isNull(col: String, test: Boolean): VlogPointPred =
    VlogPointPred(col, Seq.empty, Seq.empty, Some(test))
}

/** Builds the per-FILE parquet `FilterPredicate` from the scan's pushed
  * hints. Per file because parquet's `SchemaCompatibilityValidator`
  * REFUSES predicates naming columns the file does not carry (an
  * additively-evolved table's older files): conjuncts on absent columns
  * are dropped — sound, since dropping a conjunct only widens the kept
  * set, and every pushed filter stays residual above the scan anyway.
  *
  * Soundness shape: every emitted predicate is a SUPERSET test of the
  * original filter's matching set (closed envelope bounds, int32 clamps,
  * dropped out-of-domain points), so parquet may keep extra groups but
  * can never skip a matching one; Spark's residual filter restores
  * exactness row-by-row.
  */
object VlogFilters {

  /** Per-conjunct cap on recorded point values: beyond this the conjunct
    * is not shipped (integral INs keep their [min,max] envelope, which
    * still prunes; string INs simply skip nothing). The cap bounds task
    * serialization (every partition carries the point sets) and the
    * executor-side set size — dropping is always sound here because a
    * skipped skip only widens the kept set.
    */
  val MaxPointValues = 4096

  def forFile(fileSchema: MessageType,
      ranges: Map[String, (Long, Long)],
      points: Seq[VlogPointPred]): Option[FilterCompat.Filter] = {
    def physical(col: String): Option[PrimitiveTypeName] =
      if (!fileSchema.containsField(col)) None
      else {
        val t = fileSchema.getType(Seq(col): _*)
        if (t.isPrimitive) Some(t.asPrimitiveType().getPrimitiveTypeName)
        else None
      }

    val rangePreds: Seq[FilterPredicate] = ranges.toSeq.sortBy(_._1)
      .flatMap { case (c, (lo, hi)) =>
        physical(c) match {
          case Some(PrimitiveTypeName.INT64) =>
            val col = FilterApi.longColumn(c)
            if (lo == hi) Some(FilterApi.eq(col, java.lang.Long.valueOf(lo)))
            else {
              val conj = Seq(
                if (lo != Long.MinValue)
                  Some(FilterApi.gtEq(col, java.lang.Long.valueOf(lo)))
                else None,
                if (hi != Long.MaxValue)
                  Some(FilterApi.ltEq(col, java.lang.Long.valueOf(hi)))
                else None).flatten
              conj.reduceOption(FilterApi.and)
            }
          case Some(PrimitiveTypeName.INT32) =>
            // clamping into the int32 domain only WIDENS the envelope
            // (conservative); an equality outside the domain cannot be
            // clamped without changing meaning, so it emits nothing
            val col = FilterApi.intColumn(c)
            if (lo == hi)
              if (lo >= Int.MinValue && lo <= Int.MaxValue)
                Some(FilterApi.eq(col, Integer.valueOf(lo.toInt)))
              else None
            else {
              val l = math.max(lo, Int.MinValue.toLong).toInt
              val h = math.min(hi, Int.MaxValue.toLong).toInt
              val conj = Seq(
                if (l != Int.MinValue)
                  Some(FilterApi.gtEq(col, Integer.valueOf(l))) else None,
                if (h != Int.MaxValue)
                  Some(FilterApi.ltEq(col, Integer.valueOf(h))) else None)
                .flatten
              conj.reduceOption(FilterApi.and)
            }
          case _ => None
        }
      }

    val pointPreds: Seq[FilterPredicate] = points.flatMap { p =>
      (physical(p.col), p.nullTest) match {
        // IS [NOT] NULL: exact; parquet's statistics filter answers it
        // from per-group null counts with no page reads. A file missing
        // the column entirely falls through to the default drop-conjunct
        // path below (all its values are null — no skip, residual exact)
        case (Some(pt), Some(test)) =>
          pt match {
            case PrimitiveTypeName.INT64 =>
              val c = FilterApi.longColumn(p.col)
              val v: java.lang.Long = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case PrimitiveTypeName.INT32 =>
              val c = FilterApi.intColumn(p.col)
              val v: java.lang.Integer = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case PrimitiveTypeName.DOUBLE =>
              val c = FilterApi.doubleColumn(p.col)
              val v: java.lang.Double = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case PrimitiveTypeName.FLOAT =>
              val c = FilterApi.floatColumn(p.col)
              val v: java.lang.Float = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case PrimitiveTypeName.BOOLEAN =>
              val c = FilterApi.booleanColumn(p.col)
              val v: java.lang.Boolean = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case PrimitiveTypeName.BINARY =>
              val c = FilterApi.binaryColumn(p.col)
              val v: Binary = null
              Some(if (test) FilterApi.eq(c, v) else FilterApi.notEq(c, v))
            case _ => None
          }
        // IN sets go through parquet's SET-based In predicate, never an
        // or-fold: a left-deep Or chain recurses once per value in every
        // filter visitor (a broadcast dim's 100k keys would blow the
        // executor stack) and evaluates O(|IN|) per record in the
        // assembly filter — FilterApi.in is one node probing a hash set
        case (Some(PrimitiveTypeName.INT64), None) if p.longs.nonEmpty =>
          val col = FilterApi.longColumn(p.col)
          if (p.longs.sizeIs == 1)
            Some(FilterApi.eq(col, java.lang.Long.valueOf(p.longs.head)))
          else {
            val set = new java.util.HashSet[java.lang.Long]()
            p.longs.foreach(v => set.add(java.lang.Long.valueOf(v)))
            Some(FilterApi.in(col, set))
          }
        case (Some(PrimitiveTypeName.INT32), None) if p.longs.nonEmpty =>
          val col = FilterApi.intColumn(p.col)
          val in32 = p.longs.filter(v =>
            v >= Int.MinValue && v <= Int.MaxValue)
          // every value outside int32 is unsatisfiable on this column —
          // dropped values only shrink the set, so if ANY remain the set
          // is still a superset of the original IN's matching set; if
          // NONE remain the whole conjunct is dropped (no skip)
          if (in32.isEmpty) None
          else if (in32.sizeIs == 1)
            Some(FilterApi.eq(col, Integer.valueOf(in32.head.toInt)))
          else {
            val set = new java.util.HashSet[java.lang.Integer]()
            in32.foreach(v => set.add(Integer.valueOf(v.toInt)))
            Some(FilterApi.in(col, set))
          }
        case (Some(PrimitiveTypeName.BINARY), None) if p.strs.nonEmpty =>
          val col = FilterApi.binaryColumn(p.col)
          if (p.strs.sizeIs == 1)
            Some(FilterApi.eq(col, Binary.fromString(p.strs.head)))
          else {
            val set = new java.util.HashSet[Binary]()
            p.strs.foreach(v => set.add(Binary.fromString(v)))
            Some(FilterApi.in(col, set))
          }
        case _ => None
      }
    }

    (rangePreds ++ pointPreds).reduceOption(FilterApi.and)
      .map(FilterCompat.get)
  }
}
