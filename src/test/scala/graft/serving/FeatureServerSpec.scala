package graft.serving

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.InMemoryKVStore

/** The HTTP serving contract: 200 with the reference response envelope for
  * a synced user, 404 with a detail message otherwise. No Spark involved —
  * this is the request-time path.
  */
class FeatureServerSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var server: FeatureServer = _
  private val http = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    InMemoryKVStore.clear()
    InMemoryKVStore.set("features:u1",
      """{"day":"2024-01-05","event_count_7d":"2","event_count_30d":"2","last_event_days_ago":null,"event_type_counts":"2"}""")
    server = FeatureServer.start(0, InMemoryKVStore, clock = () => "2024-01-06T00:00:00Z")
  }

  override def afterAll(): Unit = server.stop()

  private def get(path: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:${server.port}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("synced user: 200 with user_id, as_of, parsed features, source=online") {
    val r = get("/features/online/u1")
    r.statusCode() shouldBe 200
    r.body() should include(""""user_id":"u1"""")
    r.body() should include(""""as_of":"2024-01-06T00:00:00Z"""")
    r.body() should include(""""event_count_7d":"2"""")
    r.body() should include(""""last_event_days_ago":null""")
    r.body() should include(""""source":"online"""")
  }

  test("missing user: 404 with reference detail message") {
    val r = get("/features/online/ghost")
    r.statusCode() shouldBe 404
    r.body() should include("Features not found for user_id: ghost")
  }

  test("bare prefix: 404") {
    get("/features/online/").statusCode() shouldBe 404
  }
}
