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
