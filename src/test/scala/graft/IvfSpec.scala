package graft

/** IVF ANN behaviour vs the exact scan. */
class IvfSpec extends SparkSpec {

  test("sim_search_ivf results are exact cosines and overlap the true top-10") {
    val exact = SparkEntry.queries("sim_search_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = SparkEntry.queries("sim_search_ivf")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.length === 10)
    // every IVF hit that is in the exact top-10 must carry the same cosine
    ivf.foreach { case (id, c) =>
      exact.get(id).foreach(e => assert(math.abs(e - c) < 1e-9)) }
    val recall = exact.keySet.count(k => ivf.exists(_._1 == k)) / 10.0
    assert(recall >= 0.2, s"recall@10 = $recall (nprobe=4 of 16 cells)")
  }
}
