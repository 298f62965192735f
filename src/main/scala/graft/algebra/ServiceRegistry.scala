package graft.algebra

import scala.collection.concurrent.TrieMap

/**
 * SERVICE endpoint registry — the Spark mapping of the reference's
 * federated execution (jena-arq/.../sparql/service/ServiceExec.java:37–70
 * + ServiceExecutorRegistry). Over HTTP the reference streams the inner
 * pattern to a remote SPARQL server and joins the returned bindings
 * locally; here an "endpoint" is anything that can serve a GraphSource —
 * another snapshot store, another in-session dataset, or (in a deployment
 * with egress) an ExtOp wrapping an HTTP client. Execution stays
 * SET-AT-A-TIME: the inner pattern compiles against the endpoint's source
 * and the result hash-joins with the outer bindings — the distributed
 * twin of the reference's per-binding-batch VALUES injection.
 *
 * The registry is process-global like the reference's
 * ServiceExecutorRegistry (and this repo's function registry): endpoints
 * are deployment wiring, not query state.
 */
object ServiceRegistry {
  private val endpoints = TrieMap[String, Compiler.GraphSource]()

  def register(iri: String, source: Compiler.GraphSource): Unit =
    endpoints.put(iri, source)

  def unregister(iri: String): Unit = endpoints.remove(iri)

  def lookup(iri: String): Option[Compiler.GraphSource] = endpoints.get(iri)

  /** Registered (iri, source) pairs, deterministic order — the
   * enumeration set for SERVICE with a VARIABLE target. */
  def all: Seq[(String, Compiler.GraphSource)] =
    endpoints.toSeq.sortBy(_._1)

  def clear(): Unit = endpoints.clear()
}
