package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level slow-lane tag (VERDICT r21 item 9): the heaviest suites —
 * full stream drains, the all-twins SQL parity sweep — carry this
 * annotation so an iterating developer can run the fast lane with
 *
 *   sbt "testOnly * -- -l graft.tags.Slow"
 *
 * The FULL suite (plain `sbt test`) remains the close gate; the tag adds
 * an opt-in exclusion, it never removes coverage from the gate.
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.TYPE})
public @interface Slow {}
