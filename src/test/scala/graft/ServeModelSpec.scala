package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** EP3 model-serving endpoint: train-via-ledger, load the registered
  * model, serve predictions over HTTP — the reference's declared
  * model_server contract (model_server/Dockerfile:12, serve.py absent
  * from the repo) made observable. Real HTTP over loopback.
  */
class ServeModelSpec extends SparkSpec {

  private val port = 15001
  private lazy val http = HttpClient.newHttpClient()

  private def get(path: String, p: Int = port): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$p$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def num(json: String, key: String): Double = {
    val re = ("\"" + key +
      "\"\\s*:\\s*(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)").r
    re.findFirstMatchIn(json)
      .getOrElse(fail(s"no $key in $json")).group(1).toDouble
  }

  test("model server trains via ledger, loads the model, predicts") {
    // force the train-then-log path: a reset store means start() must
    // run the engine's ml_runs_log training itself
    operators.RunStore.reset(spark, operators.RunStore.defaultRoot(sf))
    val server = ServeModel.start(spark, sf, port)
    try {
      assert(get("/health").body().contains("\"status\":\"ok\""))

      val model = get("/model").body()
      assert(model.contains("r1_ols_cents") &&
        model.contains("ols_normal_equations"), model)
      val (b0, b1, b2) = (num(model, "b0"), num(model, "b1"),
        num(model, "b2"))

      // prediction must equal the registered coefficients applied to
      // the inputs — the server serves THE logged model, not a re-train
      val y = num(post("/predict", """{"x1": 120.0, "x2": 3.0}""").body(),
        "y")
      assert(math.abs(y - (b0 + b1 * 120.0 + b2 * 3.0)) < 1e-9,
        s"prediction $y != model arithmetic")

      // malformed body → 400, not a crash
      assert(post("/predict", """{"x1": "twelve"}""").statusCode() == 400)

      // /runs serves the full ledger (both runs logged by ml_runs_log)
      val runs = get("/runs").body()
      assert(runs.contains("r1_ols_cents") &&
        runs.contains("r2_tree_depth2"), runs.take(300))
    } finally server.stop(0)
  }

  test("endpoint hardening: malformed bodies, non-finite inputs, " +
      "concurrent load") {
    val server = ServeModel.start(spark, sf, port + 2)
    def post2(path: String, body: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${port + 2}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // malformed / non-JSON / missing-key bodies → structured 400
      for (bad <- Seq("", "not json at all", "{", """{"x1": 1.0}""",
          """{"x2": 2.0}""", """{"a": 1, "b": 2}""")) {
        val r = post2("/predict", bad)
        assert(r.statusCode() == 400, s"body <$bad> → ${r.statusCode()}")
        assert(r.body().contains("\"error\""), r.body())
      }
      // a parseable-but-infinite literal must not reach the model: the
      // response would interpolate Infinity, which is invalid JSON
      val inf = post2("/predict", """{"x1": 1e999, "x2": 0}""")
      assert(inf.statusCode() == 400, inf.body())
      assert(inf.body().contains("finite"), inf.body())

      // concurrent /predict: all requests answered, none hang (the
      // executor pool is 4 threads — 16 in-flight requests exercise
      // queueing), every response identical-shape 200
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = (1 to 16).map { i =>
        scala.concurrent.Future(
          post2("/predict", s"""{"x1": $i, "x2": ${i * 2}}"""))
      }
      val rs = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(30, "s"))
      pool.shutdown()
      assert(rs.forall(_.statusCode() == 200))
      assert(rs.forall(_.body().contains("\"y\":")))
    } finally server.stop(0)
  }

  test("partial ledger (no registered model) triggers retrain, " +
      "absent data dir fails with a clear error") {
    val root = operators.RunStore.defaultRoot(sf)
    // a ledger that EXISTS but lacks the r1_ols_cents run: loadModel
    // must fall through to training, not throw NoSuchElementException
    operators.RunStore.reset(spark, root)
    operators.RunStore.log(spark, root, "r9_other", "something",
      Seq("k" -> "v"),
      spark.range(1).selectExpr("1.5 as unrelated_metric"))
    val m = ServeModel.loadModel(spark, sf)
    assert(m.runId == "r1_ols_cents" && m.b1 != 0.0)

    // no ledger AND no trainable data dir → a structured error that
    // names the registry and the sfDir, not an opaque NPE/NoSuchElement
    val bogus = s"${Tables.scratchRoot}/no_such_dir"
    operators.RunStore.reset(spark, operators.RunStore.defaultRoot(bogus))
    val err = intercept[IllegalStateException](
      ServeModel.loadModel(spark, bogus))
    assert(err.getMessage.contains(bogus), err.getMessage)
  }

  test("model survives a server restart from the persisted ledger") {
    // second start: the store exists, so no re-train — the model is
    // LOADED from the registry (the MLflow load_model analog)
    val s1 = ServeModel.start(spark, sf, port + 1)
    val m1 = try get("/model", port + 1).body() finally s1.stop(0)
    val s2 = ServeModel.start(spark, sf, port)
    try {
      val m2 = get("/model").body()
      assert(num(m2, "b1") == num(m1, "b1") &&
        num(m2, "b0") == num(m1, "b0"),
        "coefficients changed across restart — not loading the ledger")
    } finally s2.stop(0)
  }
}
