package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.pipeline.PlsPipeline

/** Brute-force oracle for the flagship run DAG (`PlsPipeline.run` — the
  * reference's `main_pls.py` stage order): random previous/imported
  * states with overlapping keys and null pids/sites, against an
  * engine-free restatement of the whole composition — pid-map upsert
  * (imported wins), geocode carry-forward with site nulling (incoming
  * wins), unmapped-address prune with its dropped complement, site
  * backfill from the per-pid MINIMUM kept-address mapping (nulls only),
  * and the final referential prune. TwoRunSpec pins one hand-built
  * two-run story; this pins the algebra on arbitrary states.
  */
object PlsPipelineProps extends Properties("PlsPipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val iris = (1 to 6).map(i => s"iri-$i")
  private val pids = (1 to 5).map(i => s"p$i")
  private val sites = (1 to 4).map(i => s"s$i")
  private val gids = (1 to 6).map(i => s"g$i")

  private def pick[A](xs: Seq[A]): Gen[A] = Gen.oneOf(xs)

  // one row per key, as the upsert contract requires
  private def pidMapGen: Gen[List[(String, String)]] =
    Gen.someOf(iris).flatMap(ks =>
      Gen.sequence[List[(String, String)], (String, String)](
        ks.toList.map(k => pick(pids).map(p => (k, p)))))

  private def geoGen: Gen[List[(String, String, Option[String], Option[String])]] =
    Gen.someOf(gids).flatMap(ks =>
      Gen.sequence[List[(String, String, Option[String], Option[String])],
                   (String, String, Option[String], Option[String])](
        ks.toList.map(g => for {
          t <- Gen.oneOf("PC", "SP")
          p <- Gen.option(pick(pids))
          st <- Gen.option(pick(sites))
        } yield (g, t, p, st))))

  private def addrGen: Gen[List[(String, Option[String], Option[String])]] =
    Gen.someOf(iris).flatMap(ks =>
      Gen.sequence[List[(String, Option[String], Option[String])],
                   (String, Option[String], Option[String])](
        ks.toList.map(k => for {
          p <- Gen.option(pick(pids))
          st <- Gen.option(pick(sites))
        } yield (k, p, st))))

  property("run == driver-side restatement of the whole DAG (random states, nulls)") =
    forAllNoShrink(Gen.option(pidMapGen), pidMapGen, Gen.option(geoGen), geoGen, addrGen) {
      (prevPid, impPid, prevGeo, impGeo, addrs) =>
        val s = spark; import s.implicits._
        def pidDf(m: List[(String, String)]) = m.toDF("address_iri", "address_pid")
        def geoDf(g: List[(String, String, Option[String], Option[String])]) =
          g.map { case (id, t, p, st) => (id, t, p.orNull, st.orNull) }
            .toDF("geocode_id", "geocode_type", "address_pid", "site_id")
        val addrDf = addrs.map { case (i, p, st) => (i, p.orNull, st.orNull) }
          .toDF("address_iri", "address_pid", "site_id")

        val out = PlsPipeline.run(PlsPipeline.RunInputs(
          prevGeo.map(geoDf), prevPid.map(pidDf), pidDf(impPid), geoDf(impGeo), addrDf))

        val gotPid = out.pidMap.collect().map(r => (r.getString(0), r.getString(1))).toSet
        val gotAddr = out.addresses.collect()
          .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
        val gotDropped = out.droppedAddresses.collect()
          .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
        // by NAME: backfillFromJoin hoists the join key to the first column
        val gotGeo = out.geocodes
          .select("geocode_id", "geocode_type", "address_pid", "site_id").collect()
          .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)), Option(r.getString(3))))
          .toSet

        // pid map: imported wins per iri
        val wantPid = (prevPid.getOrElse(Nil).toMap ++ impPid.toMap).toSet
        // geocode base: prev carried with site NULLED, incoming wins per id
        val prevNulled = prevGeo.getOrElse(Nil)
          .map { case (id, t, p, _) => id -> ((t, p, Option.empty[String])) }.toMap
        val incoming = impGeo.map { case (id, t, p, st) => id -> ((t, p, st)) }.toMap
        val geoBase = if (prevGeo.isEmpty) incoming else prevNulled ++ incoming
        // addresses: kept iff the iri is mapped; dropped = complement
        val mappedIris = wantPid.map(_._1)
        val wantAddr = addrs.filter(a => mappedIris.contains(a._1))
          .map { case (i, p, st) => (i, p, st) }.toSet
        val wantDropped = addrs.filterNot(a => mappedIris.contains(a._1))
          .map { case (i, p, st) => (i, p, st) }.toSet
        // backfill: per-pid MIN site over kept addresses with both non-null;
        // fills ONLY null geocode sites; then prune to kept-address pids
        val fills = wantAddr.toSeq.collect { case (_, Some(p), Some(st)) => (p, st) }
          .groupBy(_._1).map { case (p, g) => p -> g.map(_._2).min }
        val keptPids = wantAddr.collect { case (_, Some(p), _) => p }
        val wantGeo = geoBase.toSeq.map { case (id, (t, p, st)) =>
          (id, t, p, st.orElse(p.flatMap(fills.get)))
        }.filter { case (_, _, p, _) => p.exists(keptPids.contains) }.toSet

        gotPid == wantPid && gotAddr == wantAddr && gotDropped == wantDropped &&
          gotGeo == wantGeo
    }
}
